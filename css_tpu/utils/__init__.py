from css_tpu.utils.registry import Registry  # noqa: F401
