from css_tpu.executor.separator import Separator  # noqa: F401
from css_tpu.executor.stitcher import Stitcher  # noqa: F401
from css_tpu.executor.beamformer import Beamformer  # noqa: F401
from css_tpu.executor.pipeline import CssPipeline  # noqa: F401
from css_tpu.executor.streaming import StreamingCssPipeline  # noqa: F401
