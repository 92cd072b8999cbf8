from ilqr_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from ilqr_tpu.parallel.batch import solve_batched, run_mpc_sharded
from ilqr_tpu.parallel.horizon import backward_pass_sharded
from ilqr_tpu.parallel.horizon_solve import solve_horizon_sharded

__all__ = [
    "make_mesh", "batch_sharding", "replicated",
    "solve_batched", "run_mpc_sharded", "backward_pass_sharded",
    "solve_horizon_sharded",
]
