"""A batch of Systems with different parameters is just a stacked pytree.

Proves the claim in `models/base.py` (the reference's OO classes can't do
this at all — one instance per parameter set, solved serially): stacking the
`params` leaves of several systems gives a vmappable batch, enabling
domain-randomized solving (different physics per lane) and per-instance
reference tracking in ONE compiled program.
"""
import jax
import jax.numpy as jnp
import numpy as np

import ilqr_tpu as it


def _pendulum(l):
    return it.make_pendulum(
        0.01, [jnp.pi, 0.0], Q=jnp.eye(2), R=jnp.eye(1),
        Q_f=100.0 * jnp.eye(2), l=l, d=0.0, integrator="rk4",
    )


def test_vmap_over_system_parameters():
    # Four pendulums with different lengths, one vmapped solve.
    lengths = [0.8, 1.0, 1.2, 1.5]
    systems = [_pendulum(l) for l in lengths]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *systems)

    x0 = jnp.zeros(2)
    U0 = jnp.zeros((150, 1))
    cfg = it.IlqrConfig(maxiter=60, tol=1e-7)

    costs = jax.jit(jax.vmap(
        lambda s: it.solve(s, x0, U0, cfg).cost))(stacked)

    # Each lane matches its standalone solve exactly.
    for i, s in enumerate(systems):
        ref = it.solve(s, x0, U0, cfg).cost
        np.testing.assert_allclose(float(costs[i]), float(ref), rtol=1e-5)
    # And the physics actually differ across lanes.
    assert len(set(np.round(np.asarray(costs), 4))) == len(lengths)


def test_vmap_over_tracking_references():
    # One plant, a batch of different reference trajectories (stacked in
    # the tracking system's params) — per-instance references in one program.
    base = _pendulum(1.0)
    N = 120
    t = jnp.arange(N + 1) * base.dt

    def tracking_sys(amp):
        X_ref = jnp.stack([amp * jnp.sin(2.0 * t),
                           2.0 * amp * jnp.cos(2.0 * t)], axis=-1)
        return it.make_tracking_system(
            base, X_ref, jnp.zeros((N, 1)),
            Q=jnp.diag(jnp.array([50.0, 1.0])), R=0.01 * jnp.eye(1),
            Q_f=jnp.zeros((2, 2)))

    amps = [0.2, 0.5, 0.8]
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[tracking_sys(a) for a in amps])

    sols = jax.jit(jax.vmap(lambda s: it.solve(
        s, it.augment_x0(jnp.zeros(2)), jnp.zeros((N, 1)),
        it.IlqrConfig(maxiter=60, tol=1e-7))))(stacked)

    thetas = it.strip_clock(sols.X)[..., 0]          # (3, N+1)
    for i, a in enumerate(amps):
        ref = a * jnp.sin(2.0 * t)
        rms = float(jnp.sqrt(jnp.mean((thetas[i] - ref) ** 2)))
        assert rms < 0.05, (i, rms)
    # Each lane tracked its own amplitude.
    assert float(jnp.max(thetas[0])) < 0.3 < float(jnp.max(thetas[2]))
