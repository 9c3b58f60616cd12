"""Newtonian many-body simulators for the NMS task.

Re-design of the reference's ClofNet-derived generators
(/root/reference/src/datamodules/components/nms/synthetic_sim.py): the same
physics — leapfrog integration (dt=1e-3, force clamp ±100) of charged
particles under Coulomb interactions, optionally plus a uniform gravity
field (``static``), a Lorentz force (``dynamic``), or spring couplings —
but vectorized over a whole batch of simulations at once instead of the
reference's per-trajectory Python loops (>100x faster generation on host).

Conventions matched to the reference so the learning problem is identical:
  - charges in {-1, +1} with p = 1/2 each; ``loc_std = 1 * (n/5)^(1/3)``;
    initial speed 0.5; trajectories of T=5000 steps sampled every 100 steps
    (the initial frame is overwritten, matching sample_trajectory's counter
    behavior), giving 49 frames; the dataset pairs frame 30 -> frame 40.
  - Coulomb force on i: sum_j q_i q_j (r_i - r_j) / (|r_ij|^2 + 1e-6)^{3/2},
    componentwise clamped to ±max_F before the velocity update.
"""

from __future__ import annotations

import dataclasses
from typing import Literal, Optional, Tuple

import numpy as np

Mode = Literal["small", "small_20body", "static", "dynamic", "springs", "fixcharge"]


@dataclasses.dataclass
class SimConfig:
    mode: Mode = "small"
    n_balls: int = 5
    box_size: float = 5.0
    loc_std: float = 1.0
    vel_norm: float = 0.5
    interaction_strength: float = 1.0
    dt: float = 1e-3
    max_force: float = 0.1 / 1e-3
    gravity_constant: float = 0.098  # 'static' mode, +z field
    lorentz_field: Tuple[float, float, float] = (0.5, 0.5, 0.5)  # 'dynamic'
    noise_var: float = 0.0

    @classmethod
    def for_mode(cls, mode: Mode) -> "SimConfig":
        n = 5 if mode == "small" else 20
        if mode == "springs":
            return cls(mode=mode, n_balls=n, loc_std=0.5, interaction_strength=0.1)
        return cls(mode=mode, n_balls=n)


def _coulomb_forces(loc: np.ndarray, qq: np.ndarray, strength: float) -> np.ndarray:
    """loc [B, n, 3], qq [B, n, n] charge products -> forces [B, n, 3]."""
    diff = loc[:, :, None, :] - loc[:, None, :, :]  # r_i - r_j
    d2 = np.sum(diff * diff, axis=-1) + 1e-6
    inv_d3 = d2 ** (-1.5)
    size = strength * qq * inv_d3
    n = loc.shape[1]
    idx = np.arange(n)
    size[:, idx, idx] = 0.0
    return np.einsum("bij,bijd->bid", size, diff)


def _spring_forces(loc: np.ndarray, k: np.ndarray, strength: float) -> np.ndarray:
    diff = loc[:, :, None, :] - loc[:, None, :, :]
    size = -strength * k
    n = loc.shape[1]
    idx = np.arange(n)
    size[:, idx, idx] = 0.0
    return np.einsum("bij,bijd->bid", size, diff)


def _xla_integrate(
    cfg: SimConfig,
    edges: np.ndarray,
    charges: np.ndarray,
    pos0: np.ndarray,
    v0: np.ndarray,
    frames: int,
    sample_freq: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Leapfrog integration compiled with XLA on the host CPU (float64).

    Same math and op order as the numpy loop in ``simulate_batch`` — the
    per-step numpy version spends ~10 ms/step in dispatch overhead on
    [B,n,n,3]-sized arrays; one fused ``lax.scan`` body removes that
    entirely (measured ~40x on a 1-core host).  Trajectories agree with
    the numpy integrator to float64 roundoff over short horizons (the
    dynamics are chaotic, so bitwise equality over 5000 steps is not a
    meaningful target; both samplers draw identical initial conditions
    from the same ``np.random.Generator`` stream).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    cpu = jax.devices("cpu")[0]
    dt = cfg.dt
    n = pos0.shape[1]

    with jax.enable_x64(True):
        eye = jnp.eye(n, dtype=jnp.float64)
        grav = jnp.array([0.0, 0.0, cfg.gravity_constant], dtype=jnp.float64)
        bfield = jnp.asarray(cfg.lorentz_field, dtype=jnp.float64)

        def force(pos, v, edges, charges):
            diff = pos[:, :, None, :] - pos[:, None, :, :]
            if cfg.mode == "springs":
                size = (-cfg.interaction_strength * edges) * (1.0 - eye)
            else:
                d2 = jnp.sum(diff * diff, axis=-1) + 1e-6
                inv_d3 = d2 ** (-1.5)
                size = (cfg.interaction_strength * edges * inv_d3) * (1.0 - eye)
            F = jnp.einsum("bij,bijd->bid", size, diff)
            if cfg.mode == "static":
                F = F + grav
            elif cfg.mode == "dynamic":
                F = F + jnp.cross(v, bfield) * charges
            return jnp.clip(F, -cfg.max_force, cfg.max_force)

        def integrate(pos, v, edges, charges):
            def step(carry, _):
                pos, v = carry
                pos = pos + dt * v
                v = v + dt * force(pos, v, edges, charges)
                return (pos, v), None

            def frame_body(carry, _):
                pos, v = carry
                (pos, v), _ = lax.scan(
                    step, (pos, v), None, length=sample_freq - 1
                )
                pos = pos + dt * v  # i = k*sample_freq position update
                rec = (pos, v)  # sampled before the velocity kick
                v = v + dt * force(pos, v, edges, charges)
                return (pos, v), rec

            # half-step kick at i=0 (before the sampling loop)
            v = v + dt * force(pos, v, edges, charges)
            _, (locs, vels) = lax.scan(
                frame_body, (pos, v), None, length=frames
            )
            # [F, B, n, 3] -> [B, F, n, 3]
            return locs.transpose(1, 0, 2, 3), vels.transpose(1, 0, 2, 3)

        with jax.default_device(cpu):
            locs, vels = jax.jit(integrate)(
                jnp.asarray(pos0, dtype=jnp.float64),
                jnp.asarray(v0, dtype=jnp.float64),
                jnp.asarray(edges, dtype=jnp.float64),
                jnp.asarray(charges, dtype=jnp.float64),
            )
        return np.asarray(locs), np.asarray(vels)


def simulate_batch(
    cfg: SimConfig,
    num_sims: int,
    rng: np.random.Generator,
    T: int = 5000,
    sample_freq: int = 100,
    backend: str = "xla",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Simulate ``num_sims`` trajectories at once.

    Returns (loc [B, F, n, 3], vel [B, F, n, 3], edges [B, n, n],
    charges [B, n, 1]) with F = T // sample_freq - 1 frames.
    ``backend="xla"`` (default) integrates with a fused lax.scan on the
    host CPU; ``backend="numpy"`` keeps the original per-step loop.
    """
    n = cfg.n_balls
    B = num_sims
    frames = T // sample_freq - 1
    loc_std = cfg.loc_std * (n / 5.0) ** (1.0 / 3.0)

    if cfg.mode == "springs":
        k = rng.choice(np.array([0.0, 0.5, 1.0]), size=(B, n, n))
        k = np.triu(k, 1)
        edges = k + np.transpose(k, (0, 2, 1))
        charges = np.ones((B, n, 1))
    else:
        charges = rng.choice(np.array([-1.0, 1.0]), size=(B, n, 1))
        edges = charges @ np.transpose(charges, (0, 2, 1))

    loc = np.empty((B, frames, n, 3), dtype=np.float64)
    vel = np.empty((B, frames, n, 3), dtype=np.float64)

    pos = rng.standard_normal((B, n, 3)) * loc_std
    v = rng.standard_normal((B, n, 3))
    v = v * cfg.vel_norm / np.linalg.norm(v, axis=-1, keepdims=True)

    # reflect initial positions into the box (reference _clamp); inside the
    # integration loop the reference leaves clamping disabled.
    over = pos > cfg.box_size
    pos[over] = 2 * cfg.box_size - pos[over]
    v[over] = -np.abs(v[over])
    under = pos < -cfg.box_size
    pos[under] = -2 * cfg.box_size - pos[under]
    v[under] = np.abs(v[under])

    if backend == "xla":
        loc, vel = _xla_integrate(
            cfg, edges, charges[..., 0:1], pos, v, frames, sample_freq
        )
    else:
        def total_force(pos, v):
            if cfg.mode == "springs":
                F = _spring_forces(pos, edges, cfg.interaction_strength)
            else:
                F = _coulomb_forces(pos, edges, cfg.interaction_strength)
            # field terms are added before the clamp (reference GravitySim /
            # DynamicSim ordering)
            if cfg.mode == "static":
                F = F + np.array([0.0, 0.0, cfg.gravity_constant])
            elif cfg.mode == "dynamic":
                F = F + np.cross(v, np.asarray(cfg.lorentz_field)) * charges
            return np.clip(F, -cfg.max_force, cfg.max_force)

        # half-step leapfrog kick
        v = v + cfg.dt * total_force(pos, v)
        counter = 0
        for i in range(1, T):
            pos = pos + cfg.dt * v
            if i % sample_freq == 0:
                loc[:, counter] = pos
                vel[:, counter] = v
                counter += 1
            v = v + cfg.dt * total_force(pos, v)

    if cfg.noise_var > 0:
        loc += rng.standard_normal(loc.shape) * cfg.noise_var
        vel += rng.standard_normal(vel.shape) * cfg.noise_var
    return (
        loc.astype(np.float32),
        vel.astype(np.float32),
        edges.astype(np.float32),
        charges.astype(np.float32),
    )


def generate_split(
    mode: Mode,
    num_sims: int,
    seed: int,
    T: int = 5000,
    sample_freq: int = 100,
    chunk: int = 512,
):
    """Generate a dataset split in memory-bounded chunks."""
    cfg = SimConfig.for_mode(mode)
    rng = np.random.default_rng(seed)
    locs, vels, edges_l, charges_l = [], [], [], []
    remaining = num_sims
    while remaining > 0:
        b = min(chunk, remaining)
        loc, vel, edges, charges = simulate_batch(cfg, b, rng, T, sample_freq)
        locs.append(loc)
        vels.append(vel)
        edges_l.append(edges)
        charges_l.append(charges)
        remaining -= b
    return (
        np.concatenate(locs),
        np.concatenate(vels),
        np.concatenate(edges_l),
        np.concatenate(charges_l),
    )
