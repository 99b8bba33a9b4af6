from skix.utils.profiling import StageTimer, trace_to  # noqa: F401
