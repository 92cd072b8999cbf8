from ilqr_tpu.viz.plots import plot_trajectory, plot_convergence
from ilqr_tpu.viz.animation import (
    DoublePendulumAnimation,
    DoublePendulumAnimation3D,
    forward_kinematics,
    wall_clock_to_index,
)

__all__ = [
    "plot_trajectory", "plot_convergence",
    "DoublePendulumAnimation", "DoublePendulumAnimation3D",
    "forward_kinematics", "wall_clock_to_index",
]
