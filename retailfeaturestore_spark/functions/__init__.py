from .expressions import clip, guarded_div, indicator, not_null_filter  # noqa: F401
