"""Visualization + utils tests: plots render, mp4 export writes a playable
file (reference capability P13), checkpoint round-trips, timing helpers."""
import os

import jax.numpy as jnp
import numpy as np

import ilqr_tpu as it
from ilqr_tpu.utils.checkpoint import load_pytree, save_pytree
from ilqr_tpu.utils.timing import compile_time, timed, warmup
from ilqr_tpu.viz.animation import DoublePendulumAnimation, forward_kinematics
from ilqr_tpu.viz.plots import plot_convergence, plot_trajectory


def _small_solution():
    sys_ = it.make_pendulum(0.01, [jnp.pi, 0.0], jnp.eye(2), jnp.eye(1),
                            jnp.zeros((2, 2)), d=0.0, integrator="euler")
    return sys_, it.solve(sys_, jnp.array([1.0, 0.0]), jnp.zeros((100, 1)),
                          it.IlqrConfig(maxiter=10))


def test_forward_kinematics_geometry():
    q = np.array([[0.0, 0.0], [np.pi / 2, 0.0], [np.pi, np.pi]])
    p1, p2 = forward_kinematics(q, 1.0, 0.5)
    # Hanging down.
    np.testing.assert_allclose(p1[0], [0, -1], atol=1e-7)
    np.testing.assert_allclose(p2[0], [0, -1.5], atol=1e-7)
    # First link horizontal.
    np.testing.assert_allclose(p1[1], [1, 0], atol=1e-7)
    # Link lengths preserved everywhere.
    np.testing.assert_allclose(np.linalg.norm(p1, axis=1), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(p2 - p1, axis=1), 0.5, atol=1e-6)


def test_plots_render(tmp_path):
    _, sol = _small_solution()
    p1 = str(tmp_path / "traj.png")
    p2 = str(tmp_path / "conv.png")
    plot_trajectory(sol.X, sol.U, 0.01, x_target=[np.pi, 0], save_path=p1)
    plot_convergence(sol, save_path=p2)
    assert os.path.getsize(p1) > 1000
    assert os.path.getsize(p2) > 1000


def test_mp4_export(tmp_path):
    N = 50
    t = np.linspace(0, 1, N)
    X = np.stack([np.pi * t, 0.5 * np.sin(6 * t), np.zeros(N), np.zeros(N)], axis=1)
    path = str(tmp_path / "anim.mp4")
    DoublePendulumAnimation(X, dt=0.02).animate(save_video=True, filename=path,
                                                fps=30, resolution=(320, 320))
    assert os.path.exists(path)
    assert os.path.getsize(path) > 5000
    import cv2

    cap = cv2.VideoCapture(path)
    assert cap.isOpened()
    n_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    assert n_frames >= 25


def test_checkpoint_roundtrip(tmp_path):
    _, sol = _small_solution()
    path = str(tmp_path / "ckpt.npz")
    save_pytree(path, sol)
    like = jax.tree_util.tree_map(jnp.zeros_like, sol)
    restored = load_pytree(path, like)
    np.testing.assert_allclose(np.asarray(restored.X), np.asarray(sol.X))
    np.testing.assert_allclose(float(restored.cost), float(sol.cost))


def test_timing_helpers():
    sys_, _ = _small_solution()
    import jax

    f = jax.jit(lambda x: it.rollout(sys_, x, jnp.zeros((50, 1)))[1])
    warmup(f, jnp.zeros(2))
    sec, out = timed(f, jnp.zeros(2), reps=3)
    assert sec > 0
    assert np.isfinite(float(out))


import jax  # noqa: E402  (used in test bodies)


def test_guards():
    from ilqr_tpu.utils.guards import assert_finite, finite_leaves, solve_checked

    assert bool(finite_leaves({"a": jnp.ones(3), "b": 2.0}))
    assert not bool(finite_leaves({"a": jnp.array([1.0, jnp.nan])}))
    import pytest

    with pytest.raises(FloatingPointError, match="non-finite"):
        assert_finite({"bad": jnp.array([jnp.inf])})
    sys_, _ = _small_solution()
    sol = solve_checked(sys_, jnp.array([1.0, 0.0]), jnp.zeros((50, 1)),
                        it.IlqrConfig(maxiter=5))
    assert np.isfinite(float(sol.cost))


def test_wall_clock_to_index_semantics():
    """Reference real-time callback parity (`animation_double_pendulum.py:
    178-204`): wall-clock -> index with looping, clamping and frame skipping."""
    from ilqr_tpu.viz.animation import wall_clock_to_index

    dt, n = 0.01, 400  # 4 s of simulation
    assert wall_clock_to_index(0.0, dt, n) == 0
    assert wall_clock_to_index(1.0, dt, n) == 100
    # Slow rendering: a late tick jumps ahead (frames skipped, not slowed).
    assert wall_clock_to_index(2.5, dt, n) == 250
    # Clamp at the last step.
    assert wall_clock_to_index(3.9999, dt, n) == 399
    # Looping playback wraps modulo the total duration.
    assert wall_clock_to_index(4.0 + 1.0, dt, n) == 100
    assert wall_clock_to_index(12.5, dt, n) == 50
    # Non-looping: clamp at the end instead of wrapping.
    assert wall_clock_to_index(9.0, dt, n, loop=False) == n - 1


def test_live_preview_headless():
    """The live preview builds without a display and its timer callback
    renders wall-clock-mapped frames (smoke: no plt.show)."""
    import matplotlib
    matplotlib.use("Agg")

    N = 30
    t = np.linspace(0, 1, N)
    X = np.stack([np.pi * t, np.sin(3 * t), np.zeros(N), np.zeros(N)], axis=1)
    anim = DoublePendulumAnimation(X, dt=0.05).live_preview(show=False)
    anim._func(0)  # one timer tick
    import matplotlib.pyplot as plt
    plt.close("all")


def test_mp4_export_3d(tmp_path):
    from ilqr_tpu.viz.animation import DoublePendulumAnimation3D

    N = 40
    t = np.linspace(0, 1, N)
    X = np.stack([2.0 * t, np.sin(4 * t), np.zeros(N), np.zeros(N)], axis=1)
    path = str(tmp_path / "anim3d.mp4")
    DoublePendulumAnimation3D(X, dt=0.02).animate(
        save_video=True, filename=path, fps=30, resolution=(320, 320))
    assert os.path.getsize(path) > 5000
