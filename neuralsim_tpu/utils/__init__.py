from neuralsim_tpu.utils.logging import ResultLog, save_args_snapshot
from neuralsim_tpu.utils.profiling import phase_timer, trace_context

__all__ = ["ResultLog", "save_args_snapshot", "phase_timer", "trace_context"]
