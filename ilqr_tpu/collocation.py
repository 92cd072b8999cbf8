"""Direct collocation oracle: the same OCP as a *simultaneous* NLP.

The reference's strongest verification mechanism solves the identical
optimal-control problem as a CasADi/IPOPT collocation NLP — states AND
controls as decision variables, dynamics as equality constraints
(`/root/reference/matlab/nonlinear_iLQR.m:54-103`, `casadi_sol.m`) — and
overlays the trajectories against the iLQR solution.  That is a different
TRANSCRIPTION FAMILY from shooting: iLQR (and the L-BFGS direct-shooting
oracle in tests/test_cross_validation.py) eliminate the states through the
rollout; collocation keeps them and enforces dynamics as constraints, so
agreement rules out errors shared by all shooting-type methods.

This module is that oracle, CasADi-free, built the way a sparse NLP solver
actually works (IPOPT solves the collocation KKT system with a sparse
indefinite factorization, MUMPS/MA57 — not a dense solve, and not a Riccati
recursion): a damped Newton-KKT SQP on z = (X₁…X_N, U₀…U_{N−1}) with

    min  Σₖ l(xₖ, uₖ) + l_f(x_N)
    s.t. cₖ(z) = 0,   k = 0…N−1

and two defect forms:
  * ``defect='step'`` (default): cₖ = step(system, xₖ, uₖ) − xₖ₊₁ — the
    system's own discrete dynamics, so the NLP optimum is EXACTLY the
    discrete optimum iLQR targets, for any integrator;
  * ``defect='trapezoidal'``: cₖ = xₖ + dt/2·(f_c(xₖ,uₖ) + f_c(xₖ₊₁,uₖ))
    − xₖ₊₁ — classic trapezoidal collocation on the continuous dynamics
    (ZOH controls, matching the framework's 'trapezoidal' integrator, for
    which the two forms coincide).

Independence from the solver stack (the point of an oracle): derivatives
are evaluated by JAX autodiff as vmapped PER-STEP blocks (exact Lagrangian
Hessian, including constraint curvature), but the Newton algebra runs on
the HOST in float64 — scipy sparse LU (SuperLU) on the block-tridiagonal
KKT matrix, numpy assembly, Python line-search loop.  No Riccati recursion,
no smallmat closed forms, no Pallas kernels, no XLA linear solves, no
lax.while_loop.  The structured assembly is also what makes the oracle
scale: the dense-z ``jax.hessian`` of the previous revision compiled an
O((N·n)²)-sized XLA program (which crashed XLA:CPU codegen for the DP
problem under pytest-xdist workers and capped usable horizons near N≈120);
the per-step form compiles a few tiny programs and handles the full
reference DP swing-up horizon (N=500, `run_double_pendulum_open_loop.py:
16-70`) in seconds.

Precision: the oracle always computes in float64 (`jax.enable_x64` scoped
inside, host algebra in numpy f64) regardless of the caller's JAX mode —
an oracle exists to be sharper than the system under test.  The returned
arrays are float64.  The earlier f32-mode KKT floor (~0.4 on the stiff
Q_f=1000 DP cascade) is therefore moot: f64 is not a degraded fallback but
the documented contract, matching the reference whose CasADi/IPOPT check
is genuine double precision while the JAX side runs f32.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse
import scipy.sparse.linalg

from ilqr_tpu.models.base import System, f32_matmuls
from ilqr_tpu.ops.integrators import step
from ilqr_tpu.ops.rollout import rollout


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CollocationSolution:
    X: Any          # (N+1, n_x) states (x0 prepended)
    U: Any          # (N, n_u) controls
    cost: Any       # scalar objective at the solution
    kkt_residual: Any   # scalar: max |∇L| ∪ |c| at the solution
    iterations: Any


def _make_eval_fns(system: System, defect: str, N: int, n_x: int, n_u: int):
    """Jitted per-step derivative/merit evaluators (built under x64)."""
    dt = system.dt
    p = system.params

    def stage(x, u):
        return system.stage_cost(p, x, u)

    def con(x, u, xn):
        # c_k(x_k, u_k, x_{k+1}) for one step.
        if defect == "step":
            return step(system, x, u) - xn
        f = system.f_cont
        return x + 0.5 * dt * (f(p, x, u) + f(p, xn, u)) - xn

    def con_packed(w):
        x, u, xn = w[:n_x], w[n_x:n_x + n_u], w[n_x + n_u:]
        return con(x, u, xn)

    def lag_w(w, lam):
        return con_packed(w) @ lam

    @jax.jit
    def derivs(X, U, lam):
        """All KKT blocks at (X, U, lam) — vmapped over the horizon."""
        Xk, Xn = X[:-1], X[1:]
        lx = jax.vmap(jax.grad(stage, argnums=0))(Xk, U)
        lu = jax.vmap(jax.grad(stage, argnums=1))(Xk, U)
        lxx = jax.vmap(jax.hessian(stage, argnums=0))(Xk, U)
        luu = jax.vmap(jax.hessian(stage, argnums=1))(Xk, U)
        lux = jax.vmap(jax.jacfwd(jax.grad(stage, argnums=1), argnums=0))(
            Xk, U)
        lfx = jax.grad(lambda x: system.terminal_cost(p, x))(X[-1])
        lfxx = jax.hessian(lambda x: system.terminal_cost(p, x))(X[-1])
        c = jax.vmap(con)(Xk, U, Xn)
        A = jax.vmap(jax.jacfwd(con, argnums=0))(Xk, U, Xn)
        B = jax.vmap(jax.jacfwd(con, argnums=1))(Xk, U, Xn)
        C = jax.vmap(jax.jacfwd(con, argnums=2))(Xk, U, Xn)
        W = jax.vmap(jax.hessian(lag_w, argnums=0))(
            jnp.concatenate([Xk, U, Xn], axis=1), lam)
        return dict(lx=lx, lu=lu, lxx=lxx, luu=luu, lux=lux, lfx=lfx,
                    lfxx=lfxx, c=c, A=A, B=B, C=C, W=W)

    @jax.jit
    def obj_con(X, U):
        cost = jnp.sum(jax.vmap(stage)(X[:-1], U)) + system.terminal_cost(
            p, X[-1])
        c = jax.vmap(con)(X[:-1], U, X[1:])
        return cost, c

    @jax.jit
    def merit_candidates(X, U, dX, dU, alphas, rho):
        def one(a):
            cost, c = obj_con(X + a * dX, U + a * dU)
            return cost + rho * jnp.sum(jnp.abs(c))

        return jax.vmap(one)(alphas)

    return derivs, obj_con, merit_candidates


def _assemble_kkt(d, N, n_x, n_u, mu):
    """Block-tridiagonal KKT matrix + residual in interleaved ordering.

    Variable block k (k = 0…N−1): [u_k (n_u), λ_k (n_x), x_{k+1} (n_x)];
    x_0 is data, not a variable.  Constraint c_k couples (x_k, u_k, x_{k+1})
    and the stage cost couples (x_k, u_k), so every nonzero lives within two
    adjacent blocks — bandwidth O(n_x+n_u), independent of N.
    """
    m = n_u + 2 * n_x
    n = N * m
    iu = np.arange(N) * m                     # u_k start
    il = iu + n_u                             # λ_k start
    ix = il + n_x                             # x_{k+1} start
    # Column index of x_k as a variable: ix[k-1] for k ≥ 1; x_0 is fixed.
    ixk = np.concatenate([[-1], ix[:-1]])     # -1 marks "not a variable"

    rows, cols, vals = [], [], []

    def put(r0, c0, block, mask_r=None, mask_c=None):
        """Scatter dense (N, a, b) blocks at per-step offsets r0, c0 (N,)."""
        Nb, a, b = block.shape
        r = r0[:, None, None] + np.arange(a)[None, :, None]
        cc = c0[:, None, None] + np.arange(b)[None, None, :]
        keep = (r0 >= 0)[:, None, None] & (c0 >= 0)[:, None, None]
        keep = np.broadcast_to(keep, block.shape)
        rows.append(np.broadcast_to(r, block.shape)[keep])
        cols.append(np.broadcast_to(cc, block.shape)[keep])
        vals.append(block[keep])

    def put_sym(r0, c0, block):
        put(r0, c0, block)
        put(c0, r0, np.swapaxes(block, 1, 2))

    # Hessian of the Lagrangian (exact): stage-cost blocks + constraint
    # curvature W_k over (x_k, u_k, x_{k+1}) + terminal l_f_xx.
    put(iu, iu, d["luu"])
    put(ixk, ixk, d["lxx"])
    put_sym(iu, ixk, d["lux"])
    lfxx = d["lfxx"][None]
    put(ix[-1:], ix[-1:], lfxx)
    W = d["W"]
    sl_x, sl_u, sl_n = slice(0, n_x), slice(n_x, n_x + n_u), slice(
        n_x + n_u, None)
    put(ixk, ixk, W[:, sl_x, sl_x])
    put(iu, iu, W[:, sl_u, sl_u])
    put(ix, ix, W[:, sl_n, sl_n])
    put_sym(iu, ixk, W[:, sl_u, sl_x])
    put_sym(ix, ixk, W[:, sl_n, sl_x])
    put_sym(ix, iu, W[:, sl_n, sl_u])
    # Levenberg damping on the primal diagonal only.
    prim = np.concatenate([(iu[:, None] + np.arange(n_u)).ravel(),
                           (ix[:, None] + np.arange(n_x)).ravel()])
    rows.append(prim)
    cols.append(prim)
    vals.append(np.full(prim.shape, mu))
    # Constraint Jacobian rows (λ_k) and symmetric transposes.
    put_sym(il, ixk, d["A"])
    put_sym(il, iu, d["B"])
    put_sym(il, ix, d["C"])

    KKT = scipy.sparse.csc_matrix(
        (np.concatenate(vals),
         (np.concatenate(rows), np.concatenate(cols))), shape=(n, n))

    # Residual (negated RHS): stationarity wrt u_k / x_k, and c_k.
    lam = d["lam"]
    r_u = d["lu"] + np.einsum("kiu,ki->ku", d["B"], lam)
    r_x = np.empty((N, n_x))
    r_x[:-1] = (d["lx"][1:]
                + np.einsum("kij,ki->kj", d["A"][1:], lam[1:])
                + np.einsum("kij,ki->kj", d["C"][:-1], lam[:-1]))
    r_x[-1] = d["lfx"] + d["C"][-1].T @ lam[-1]
    rhs = np.zeros(n)
    rhs[(iu[:, None] + np.arange(n_u)).ravel()] = -r_u.ravel()
    rhs[(ix[:, None] + np.arange(n_x)).ravel()] = -r_x.ravel()
    rhs[(il[:, None] + np.arange(n_x)).ravel()] = -d["c"].ravel()
    kkt_inf = max(np.max(np.abs(r_u)), np.max(np.abs(r_x)),
                  np.max(np.abs(d["c"])))
    return KKT, rhs, kkt_inf, (iu, il, ix)


@f32_matmuls
def solve_collocation(
    system: System,
    x0: jnp.ndarray,
    U_init: jnp.ndarray,
    defect: str = "step",
    maxiter: int = 150,
    tol: float = 1e-6,
    damping: float = 1e-6,
    X_init: jnp.ndarray | None = None,
) -> CollocationSolution:
    """Solve the OCP as a simultaneous NLP (sparse damped Newton-KKT, f64).

    ``X_init=None`` seeds the states with the rollout of ``U_init`` (a
    feasible start); pass e.g. a straight-line interpolation to start
    infeasible — collocation does not need dynamically consistent iterates.
    """
    if defect not in ("step", "trapezoidal"):
        raise ValueError(f"defect must be 'step'|'trapezoidal', got {defect}")
    N, n_u = U_init.shape
    n_x = x0.shape[0]

    with jax.enable_x64(True):
        derivs, obj_con, merit_candidates = _make_eval_fns(
            system, defect, N, n_x, n_u)
        x0_ = jnp.asarray(np.asarray(x0), dtype=jnp.float64)
        U = jnp.asarray(np.asarray(U_init), dtype=jnp.float64)
        if X_init is None:
            X, _ = rollout(system, x0_, U)
            X = jnp.asarray(np.asarray(X), dtype=jnp.float64)
        else:
            X = jnp.concatenate(
                [x0_[None],
                 jnp.asarray(np.asarray(X_init), jnp.float64)[1:]])
        lam = jnp.zeros((N, n_x), dtype=jnp.float64)
        alphas = jnp.asarray([0.5 ** i for i in range(16)], jnp.float64)

        mu = float(damping)
        iters = 0
        kkt_inf = np.inf
        for _ in range(maxiter):
            d = {k: np.asarray(v) for k, v in derivs(X, U, lam).items()}
            d["lam"] = np.asarray(lam)
            KKT, rhs, kkt_inf, (iu, il, ix) = _assemble_kkt(
                d, N, n_x, n_u, mu)
            if kkt_inf < tol:
                break
            iters += 1
            sol = scipy.sparse.linalg.spsolve(KKT, rhs)
            if not np.all(np.isfinite(sol)):
                mu = max(mu, damping) * 10.0
                if mu > 1e8:
                    break
                continue
            dU = sol[(iu[:, None] + np.arange(n_u)).ravel()].reshape(N, n_u)
            dXt = sol[(ix[:, None] + np.arange(n_x)).ravel()].reshape(N, n_x)
            dlam = sol[(il[:, None] + np.arange(n_x)).ravel()].reshape(
                N, n_x)
            dX = jnp.concatenate(
                [jnp.zeros((1, n_x), jnp.float64), jnp.asarray(dXt)])
            dU_j = jnp.asarray(dU)

            # ℓ1-merit backtracking (first improving α); the exact-penalty
            # weight must dominate the multipliers.
            rho = max(10.0, 2.0 * float(np.max(np.abs(
                np.asarray(lam) + dlam))))
            cand = np.asarray(merit_candidates(
                X, U, dX, dU_j, alphas, jnp.float64(rho)))
            cost0, c0 = obj_con(X, U)
            m0 = float(cost0) + rho * float(np.sum(np.abs(np.asarray(c0))))
            ok = np.isfinite(cand) & (cand < m0)
            if ok.any():
                a = float(alphas[int(np.argmax(ok))])
                X = X + a * dX
                U = U + a * dU_j
                lam = lam + a * jnp.asarray(dlam)
                # Adaptive floor: strong Levenberg damping globalizes the
                # stiff swing-up cascades far from the solution, but a fixed
                # floor stalls the Newton tail — let the floor track the KKT
                # residual so the final iterations are (near-)undamped.
                mu = max(mu * 0.3, min(damping, kkt_inf))
            else:
                mu = max(mu, damping) * 10.0
                if mu > 1e8:
                    break

        cost, _ = obj_con(X, U)
        sol = CollocationSolution(
            X=X, U=U, cost=cost,
            kkt_residual=jnp.asarray(kkt_inf, dtype=X.dtype),
            iterations=jnp.asarray(iters))
    return sol
