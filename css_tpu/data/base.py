from css_tpu.utils.registry import Registry

DATASETS = Registry("dataset")
