from .profiling import stage_timer, trace, StageStats  # noqa: F401
