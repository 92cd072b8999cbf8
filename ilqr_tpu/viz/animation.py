"""Double-pendulum animation with mp4 export, live real-time preview and a
3-D scene renderer.

Capability parity with the reference's VTK subsystem
(`/root/reference/python/class_files/animations/animation_double_pendulum.py`):
forward-kinematics precompute over the whole trajectory (`:48-76`), offline
smooth video export by resampling the simulation to a fixed fps and writing
frames through OpenCV's VideoWriter (`:222-262`), a live real-time preview
whose 60 Hz timer callback maps WALL-CLOCK time to the simulation index —
skipping frames when rendering falls behind and looping playback
(`:178-204, 267-285`) — and a 3-D scene (cuboid links, sphere joints, floor,
time-text, `:78-148`).  VTK is not available in this image, so frames are
rendered with matplotlib (2-D Agg / mplot3d) — a deliberately lighter
host-side pipeline over the same device-computed `(N+1, n_x)` trajectory.
"""
from __future__ import annotations

import time

import numpy as np


def wall_clock_to_index(elapsed: float, dt: float, n_steps: int,
                        loop: bool = True) -> int:
    """Map elapsed wall-clock seconds to a simulation index.

    Exactly the reference's real-time callback semantics
    (`animation_double_pendulum.py:178-204`): wrap elapsed time modulo the
    total duration (looping playback), convert to an index with int(t/dt),
    clamp to the last step.  Because the index is derived from the CLOCK and
    not from a frame counter, slow rendering automatically skips simulation
    frames instead of slowing playback down.
    """
    total = n_steps * dt
    t = (elapsed % total) if loop else min(elapsed, total)
    idx = int(t / dt)
    return min(idx, n_steps - 1)


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

    def live_preview(self, fps: int = 60, show: bool = True, loop: bool = True):
        """Real-time preview with wall-clock sync and frame skipping.

        Mirrors the reference's live branch (`animation_double_pendulum.py:
        267-285`): the screen updates at ``fps`` Hz and each tick maps the
        wall clock to a simulation index via `wall_clock_to_index` — if a
        frame takes longer than 1/fps to draw, the next tick simply jumps
        further ahead in simulation time, keeping playback real-time.
        """
        import matplotlib.pyplot as plt
        from matplotlib.animation import FuncAnimation

        n_steps = self.X.shape[0]
        start = time.time()
        fig, ax = plt.subplots(figsize=(6, 6))

        def update(_frame):
            idx = wall_clock_to_index(time.time() - start, self.dt, n_steps,
                                      loop=loop)
            self._render_frame(idx, fig, ax)

        anim = FuncAnimation(fig, update, interval=1000.0 / fps,
                             cache_frame_data=False)
        if show:
            plt.show()
        return anim

    def animate(self, save_video: bool = False, filename: str = "animation.mp4",
                fps: int = 60, resolution=(640, 640), show: bool = False):
        """Reference-shaped entry point (`animation_double_pendulum.py:206`):
        offline export when ``save_video``, else live real-time preview."""
        if save_video:
            return self.save_video(filename, fps=fps, resolution=resolution)
        if show:
            return self.live_preview(fps=fps)
        return None


class DoublePendulumAnimation3D:
    """3-D scene render of a double-pendulum trajectory.

    Capability parity with the reference's VTK scene
    (`animation_double_pendulum.py:78-148`): two cuboid links, sphere joints,
    a floor plane and a time-text actor — built with matplotlib's mplot3d
    (VTK is not in this image).  The pendulum swings in the x–z plane; links
    are rectangular cuboids of width `link_w` extruded in y.
    """

    def __init__(self, X, dt: float, l1: float = 1.0, l2: float = 1.0,
                 link_w: float = 0.08):
        self.X = np.asarray(X)
        self.dt = float(dt)
        self.l1, self.l2 = float(l1), float(l2)
        self.link_w = float(link_w)
        self.p1, self.p2 = forward_kinematics(self.X[:, :2], self.l1, self.l2)

    def _cuboid_faces(self, a, b):
        """6 quad faces of a cuboid link from joint a to joint b (2-D points
        in the x–z plane, extruded ±link_w/2 in y and widened in-plane)."""
        a3 = np.array([a[0], 0.0, a[1]])
        b3 = np.array([b[0], 0.0, b[1]])
        axis = b3 - a3
        L = np.linalg.norm(axis) + 1e-12
        t = axis / L
        # In-plane normal (perpendicular to the link, still in x–z).
        n_ip = np.array([-t[2], 0.0, t[0]]) * (self.link_w / 2)
        n_y = np.array([0.0, self.link_w / 2, 0.0])
        c = [a3 - n_ip - n_y, a3 + n_ip - n_y, b3 + n_ip - n_y, b3 - n_ip - n_y,
             a3 - n_ip + n_y, a3 + n_ip + n_y, b3 + n_ip + n_y, b3 - n_ip + n_y]
        quads = [(0, 1, 2, 3), (4, 5, 6, 7), (0, 1, 5, 4),
                 (2, 3, 7, 6), (1, 2, 6, 5), (0, 3, 7, 4)]
        return [[c[i] for i in q] for q in quads]

    def _render_frame(self, idx: int, fig, ax):
        from mpl_toolkits.mplot3d.art3d import Poly3DCollection

        ax.clear()
        L = self.l1 + self.l2
        ax.set_xlim(-1.1 * L, 1.1 * L)
        ax.set_ylim(-1.1 * L, 1.1 * L)
        ax.set_zlim(-1.2 * L, 1.2 * L)
        # Floor plane below the workspace (reference scene `:120-133`).
        xx, yy = np.meshgrid(np.linspace(-1.1 * L, 1.1 * L, 2),
                             np.linspace(-1.1 * L, 1.1 * L, 2))
        ax.plot_surface(xx, yy, np.full_like(xx, -1.2 * L),
                        color="#d9d9d9", alpha=0.5, shade=False)
        p1, p2 = self.p1[idx], self.p2[idx]
        for (a, b, col) in [((0.0, 0.0), p1, "#2a6fbb"), (p1, p2, "#bb4a2a")]:
            ax.add_collection3d(Poly3DCollection(
                self._cuboid_faces(np.asarray(a), np.asarray(b)),
                facecolors=col, edgecolors="k", linewidths=0.3, alpha=0.95))
        # Sphere joints (scatter markers) at base / elbow / tip.
        ax.scatter([0, p1[0], p2[0]], [0, 0, 0], [0, p1[1], p2[1]],
                   s=[60, 90, 90], c=["k", "#1b4a80", "#803a1b"],
                   depthshade=False)
        # Time-text actor (reference `:135-140`).
        ax.text2D(0.03, 0.95, f"t = {idx * self.dt:.2f} s",
                  transform=ax.transAxes, fontsize=12)
        ax.set_box_aspect((1, 1, 1.1))

    def save_video(self, filename: str, fps: int = 60, resolution=(640, 640)):
        """Offline smooth 3-D render → mp4 (same resampling protocol as the
        2-D exporter / reference `:222-262`)."""
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
        fig = plt.figure(figsize=(resolution[0] / dpi, resolution[1] / dpi),
                         dpi=dpi)
        ax = fig.add_subplot(projection="3d")
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

    def live_preview(self, fps: int = 60, show: bool = True, loop: bool = True):
        """Real-time 3-D preview with wall-clock sync (see
        `DoublePendulumAnimation.live_preview`)."""
        import matplotlib.pyplot as plt
        from matplotlib.animation import FuncAnimation

        n_steps = self.X.shape[0]
        start = time.time()
        fig = plt.figure(figsize=(6, 6))
        ax = fig.add_subplot(projection="3d")

        def update(_frame):
            idx = wall_clock_to_index(time.time() - start, self.dt, n_steps,
                                      loop=loop)
            self._render_frame(idx, fig, ax)

        anim = FuncAnimation(fig, update, interval=1000.0 / fps,
                             cache_frame_data=False)
        if show:
            plt.show()
        return anim

    def animate(self, save_video: bool = False,
                filename: str = "animation_3d.mp4", fps: int = 60,
                resolution=(640, 640), show: bool = False):
        if save_video:
            return self.save_video(filename, fps=fps, resolution=resolution)
        if show:
            return self.live_preview(fps=fps)
        return None
