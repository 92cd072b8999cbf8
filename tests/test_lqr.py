"""LQR one-shot solver and ZOH discretization tests
(reference capabilities M4/M5, `matlab/CLASSES/Linear_iLQR_CLASS.m`,
`matlab/functions/cont2disc.m`)."""
import jax.numpy as jnp
import numpy as np

from ilqr_tpu.models.linear import cont2disc
from ilqr_tpu.ops.lqr import lqr_solve, lqr_backward


def test_cont2disc_double_integrator():
    # Double integrator has the closed form A_d = [[1, dt], [0, 1]],
    # B_d = [dt²/2, dt].
    dt = 0.1
    A = jnp.array([[0.0, 1.0], [0.0, 0.0]])
    B = jnp.array([[0.0], [1.0]])
    A_d, B_d = cont2disc(A, B, dt)
    np.testing.assert_allclose(A_d, [[1.0, dt], [0.0, 1.0]], atol=1e-7)
    np.testing.assert_allclose(B_d, [[dt**2 / 2], [dt]], atol=1e-7)


def test_lqr_matches_scalar_riccati():
    # Scalar system: exact Riccati recursion computed by hand.
    a, b, q, r, qf = 0.9, 0.5, 1.0, 0.2, 2.0
    N = 25
    A = jnp.array([[a]])
    B = jnp.array([[b]])
    K, k_ff, S, s = lqr_backward(
        A, B, jnp.array([[q]]), jnp.array([[r]]), jnp.array([[qf]]), N=N
    )
    # Hand recursion.
    P = qf
    Ps, Ks = [], []
    for _ in range(N):
        Kk = (b * P * a) / (r + b * P * b)
        P_new = q + a * P * (a - b * Kk)
        Ps.append(P)
        Ks.append(Kk)
        P = P_new
    Ps.reverse()
    Ks.reverse()
    np.testing.assert_allclose(np.asarray(K)[:, 0, 0], Ks, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(S)[:, 0, 0], Ps, rtol=1e-5)


def test_lqr_gradient_optimality():
    """The LQR solution must be a stationary point of the rollout cost in U."""
    import jax

    dt = 0.1
    A = jnp.array([[1.0, dt], [0.0, 1.0]])
    B = jnp.array([[dt**2 / 2], [dt]])
    Q, R, Q_f = jnp.eye(2), jnp.eye(1), 5.0 * jnp.eye(2)
    x0 = jnp.array([2.0, -1.0])
    N = 30
    sol = lqr_solve(A, B, Q, R, Q_f, x0, N)

    def total_cost(U):
        def body(x, u):
            c = 0.5 * (x @ Q @ x + u @ R @ u)
            return A @ x + B @ u, c

        xN, cs = jax.lax.scan(body, x0, U)
        return jnp.sum(cs) + 0.5 * xN @ Q_f @ xN

    g = jax.grad(total_cost)(sol.U)
    assert float(jnp.max(jnp.abs(g))) < 1e-4
    np.testing.assert_allclose(float(total_cost(sol.U)), float(sol.cost), rtol=1e-5)
