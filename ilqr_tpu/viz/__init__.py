from ilqr_tpu.viz.plots import plot_trajectory, plot_convergence
from ilqr_tpu.viz.animation import DoublePendulumAnimation, forward_kinematics

__all__ = [
    "plot_trajectory", "plot_convergence",
    "DoublePendulumAnimation", "forward_kinematics",
]
