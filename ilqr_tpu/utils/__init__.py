from ilqr_tpu.utils.timing import warmup, timed, compile_time, trace
from ilqr_tpu.utils.checkpoint import save_pytree, load_pytree

__all__ = ["warmup", "timed", "compile_time", "trace", "save_pytree", "load_pytree"]
