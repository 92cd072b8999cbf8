from ilqr_tpu.ops.integrators import step
from ilqr_tpu.ops.linearize import linearize_trajectory, TrajectoryExpansion
from ilqr_tpu.ops.riccati import backward_pass
from ilqr_tpu.ops.parallel_riccati import backward_pass_associative
from ilqr_tpu.ops.rollout import rollout, closed_loop_rollout, linesearch_rollouts
from ilqr_tpu.ops.lqr import lqr_solve, lqr_backward
from ilqr_tpu.ops.smallmat import solve_small, inv_small
