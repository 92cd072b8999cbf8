"""Double-pendulum animation with mp4 export.

Capability parity with the reference's VTK subsystem
(`/root/reference/python/class_files/animations/animation_double_pendulum.py`):
forward-kinematics precompute over the whole trajectory (`:48-76`), offline
smooth video export by resampling the simulation to a fixed fps and writing
frames through OpenCV's VideoWriter (`:222-262`), and a live preview mode.
VTK is not available in this image, so frames are rendered with matplotlib
(Agg) — a deliberately lighter host-side pipeline over the same
device-computed `(N+1, n_x)` trajectory.
"""
from __future__ import annotations

import numpy as np


def forward_kinematics(q: np.ndarray, l1: float, l2: float):
    """Joint/end-effector positions for all frames.

    q: (N, 2) joint angles measured from hanging-down (reference convention).
    Returns (p1, p2): elbow and tip positions, each (N, 2).
    """
    # Hanging down at q=0 → unit vector (sin q, -cos q).
    a1 = q[:, 0]
    a2 = q[:, 0] + q[:, 1]
    p1 = np.stack([l1 * np.sin(a1), -l1 * np.cos(a1)], axis=1)
    p2 = p1 + np.stack([l2 * np.sin(a2), -l2 * np.cos(a2)], axis=1)
    return p1, p2


class DoublePendulumAnimation:
    """Render a double-pendulum trajectory; export mp4 or preview live."""

    def __init__(self, X, dt: float, l1: float = 1.0, l2: float = 1.0):
        self.X = np.asarray(X)  # (N+1, n_x) time-major
        self.dt = float(dt)
        self.l1, self.l2 = float(l1), float(l2)
        self.p1, self.p2 = forward_kinematics(self.X[:, :2], self.l1, self.l2)

    def _render_frame(self, idx: int, fig, ax):
        ax.clear()
        L = self.l1 + self.l2
        ax.set_xlim(-1.1 * L, 1.1 * L)
        ax.set_ylim(-1.1 * L, 1.1 * L)
        ax.set_aspect("equal")
        ax.grid(alpha=0.25)
        p1, p2 = self.p1[idx], self.p2[idx]
        ax.plot([0, p1[0]], [0, p1[1]], "-", lw=4, c="#2a6fbb")
        ax.plot([p1[0], p2[0]], [p1[1], p2[1]], "-", lw=4, c="#bb4a2a")
        ax.plot([0], [0], "ko", ms=8)
        ax.plot([p1[0]], [p1[1]], "o", ms=10, c="#1b4a80")
        ax.plot([p2[0]], [p2[1]], "o", ms=10, c="#803a1b")
        # Faint tip trail.
        lo = max(0, idx - 60)
        ax.plot(self.p2[lo:idx + 1, 0], self.p2[lo:idx + 1, 1],
                "-", lw=1, alpha=0.4, c="#803a1b")
        ax.set_title(f"t = {idx * self.dt:.2f} s")

    def save_video(self, filename: str, fps: int = 60, resolution=(640, 640)):
        """Offline smooth render: resample sim steps to ``fps`` and write mp4
        via cv2.VideoWriter (reference `:222-262`)."""
        import cv2
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        n_frames_sim = self.X.shape[0]
        T = (n_frames_sim - 1) * self.dt
        n_frames_out = max(int(T * fps), 1)
        idxs = np.clip(
            np.round(np.arange(n_frames_out) / fps / self.dt).astype(int),
            0, n_frames_sim - 1,
        )

        dpi = 100
        fig, ax = plt.subplots(
            figsize=(resolution[0] / dpi, resolution[1] / dpi), dpi=dpi
        )
        writer = cv2.VideoWriter(
            filename, cv2.VideoWriter_fourcc(*"mp4v"), fps, resolution
        )
        try:
            for idx in idxs:
                self._render_frame(int(idx), fig, ax)
                fig.canvas.draw()
                buf = np.asarray(fig.canvas.buffer_rgba())[:, :, :3]
                if buf.shape[:2][::-1] != tuple(resolution):
                    buf = cv2.resize(buf, resolution)
                writer.write(cv2.cvtColor(buf, cv2.COLOR_RGB2BGR))
        finally:
            writer.release()
            plt.close(fig)
        return filename

    def animate(self, save_video: bool = False, filename: str = "animation.mp4",
                fps: int = 60, resolution=(640, 640), show: bool = False):
        """Reference-shaped entry point (`animation_double_pendulum.py:206`):
        offline export when ``save_video`` else interactive preview."""
        if save_video:
            return self.save_video(filename, fps=fps, resolution=resolution)
        if show:
            import matplotlib.pyplot as plt
            from matplotlib.animation import FuncAnimation

            fig, ax = plt.subplots(figsize=(6, 6))
            anim = FuncAnimation(
                fig, lambda i: self._render_frame(i % self.X.shape[0], fig, ax),
                frames=self.X.shape[0], interval=1000 * self.dt,
            )
            plt.show()
            return anim
        return None
