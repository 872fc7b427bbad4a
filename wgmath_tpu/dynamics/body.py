"""Rigid-body state + integration (≙ wgrapier dynamics/body.rs:31-380 +
body.wgsl:166-364).

Structure-of-arrays pytrees over all bodies; every function is batched over
the body axis (the TPU replacement for one-thread-per-body kernels). 2D/3D is
a value-level ``dim`` inferred from array shapes, not a build flavor.

Conventions (matching the reference's contracts):
- ``inv_mass`` is a per-axis *vector* so individual translation axes can be
  locked (body.wgsl LocalMassProperties.inv_mass).
- 3D local inertia is (inertia_ref_frame quaternion, inv_principal_inertia
  vec3); world inertia is the rotated tensor R diag R^T (updateMprops).
- Velocity integration is semi-implicit Euler about the center of mass with a
  quaternion exponential map for the rotation update (integrateVelocity).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import tree_util

from wgmath_tpu.core.module import EntryPoint, KernelModule, register_module
from wgmath_tpu.geometry import quat, rot2
from wgmath_tpu.geometry.sim import Sim


def _leading(x, dim):
    return x.shape[:-1] if x.ndim > 1 else x.shape


@tree_util.register_pytree_node_class
@dataclasses.dataclass
class Velocity:
    linear: jax.Array  # [N, dim]
    angular: jax.Array  # [N, 3] (3D) or [N] (2D)

    def tree_flatten(self):
        return (self.linear, self.angular), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @staticmethod
    def zero(n: int, dim: int) -> "Velocity":
        ang = jnp.zeros((n, 3) if dim == 3 else (n,), jnp.float32)
        return Velocity(jnp.zeros((n, dim), jnp.float32), ang)


@tree_util.register_pytree_node_class
@dataclasses.dataclass
class LocalMassProperties:
    inv_mass: jax.Array  # [N, dim] per-axis (axis locking)
    com: jax.Array  # [N, dim]
    # 3D: principal frame + principal inverse inertia; 2D: scalar inv inertia
    inertia_ref_frame: jax.Array | None  # [N, 4] quat (3D) or None (2D)
    inv_principal_inertia: jax.Array  # [N, 3] (3D) or [N] (2D scalar)

    def tree_flatten(self):
        return (self.inv_mass, self.com, self.inertia_ref_frame,
                self.inv_principal_inertia), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@tree_util.register_pytree_node_class
@dataclasses.dataclass
class WorldMassProperties:
    inv_mass: jax.Array  # [N, dim]
    com: jax.Array  # [N, dim]
    inv_inertia: jax.Array  # [N, 3, 3] (3D) or [N] (2D)

    def tree_flatten(self):
        return (self.inv_mass, self.com, self.inv_inertia), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@tree_util.register_pytree_node_class
@dataclasses.dataclass
class Bodies:
    """All rigid bodies, SoA (≙ GpuBodySet, dynamics/body.rs:120).

    ``kinematic`` ([N] bool, optional) marks one-way-coupled bodies
    (≙ BodyCoupling::OneWay, body.rs:169-192): zero inverse mass (the
    solver never changes their velocity — im=0 sides take zero impulse
    deltas) but their PRESCRIBED velocity is kept through the solve, so it
    (a) enters every contact's relative-velocity term — a moving platform
    pushes/drags dynamic bodies through normal + friction impulses — and
    (b) integrates their pose each step. This goes beyond the reference,
    whose cleanup kernel zeroes every im=0 body's solver velocity
    (solver.wgsl:194-208) and which only exposes the coupling flag to the
    downstream MPM consumer; here kinematic bodies are first-class in the
    rigid-body solve itself."""

    poses: Sim  # batched [N]
    vels: Velocity
    local_mprops: LocalMassProperties
    kinematic: jax.Array | None = None  # [N] bool; None ⇒ none kinematic

    def tree_flatten(self):
        return (self.poses, self.vels, self.local_mprops,
                self.kinematic), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        # pre-kinematic checkpoints carry 3-child treedefs — default applies
        return cls(*children)

    @property
    def num_bodies(self) -> int:
        return self.poses.translation.shape[0]

    @property
    def dim(self) -> int:
        return self.poses.translation.shape[-1]

    def is_dynamic(self) -> jax.Array:
        """[N] bool — any unlocked translation axis (the reference's
        static-body test: any(inv_mass != 0), solver.wgsl:91). Kinematic
        bodies are NOT dynamic: the solver treats them as infinite mass."""
        return jnp.any(self.local_mprops.inv_mass != 0.0, axis=-1)

    def is_kinematic(self) -> jax.Array:
        """[N] bool — one-way-coupled (velocity-prescribed) bodies."""
        if self.kinematic is None:
            return jnp.zeros(self.num_bodies, bool)
        return self.kinematic

    def is_moving(self) -> jax.Array:
        """[N] bool — bodies whose pose integrates (dynamic ∪ kinematic);
        the broad-phase cache treats exactly these as able to escape their
        reference boxes."""
        return self.is_dynamic() | self.is_kinematic()


# -- device functions ---------------------------------------------------------


def update_mprops(poses: Sim, local: LocalMassProperties) -> WorldMassProperties:
    """World-space mass properties from pose (≙ body.wgsl updateMprops)."""
    from wgmath_tpu.geometry import sim as sim_ops

    world_com = sim_ops.mul_pt(poses, local.com)
    dim = poses.translation.shape[-1]
    if dim == 2:
        return WorldMassProperties(local.inv_mass, world_com,
                                   local.inv_principal_inertia)
    r = quat.to_matrix(quat.mul(poses.rotation, local.inertia_ref_frame))
    # I⁻¹_world = R diag(inv_principal) Rᵀ
    inv_inertia = jnp.einsum("...ik,...k,...jk->...ij", r,
                             local.inv_principal_inertia, r)
    return WorldMassProperties(local.inv_mass, world_com, inv_inertia)


def apply_impulse(mprops: WorldMassProperties, vel: Velocity,
                  lin_imp: jax.Array, ang_imp: jax.Array) -> Velocity:
    """≙ body.wgsl applyImpulse."""
    dlin = mprops.inv_mass * lin_imp
    if mprops.inv_inertia.ndim == vel.angular.ndim + 1:  # 3D matrix
        dang = jnp.einsum("...ij,...j->...i", mprops.inv_inertia, ang_imp)
    else:
        dang = mprops.inv_inertia * ang_imp
    return Velocity(vel.linear + dlin, vel.angular + dang)


def integrate_forces(mprops: WorldMassProperties, vel: Velocity,
                     lin_force: jax.Array, ang_force: jax.Array,
                     dt) -> Velocity:
    """≙ body.wgsl integrateForces (explicit Euler on velocities)."""
    v = apply_impulse(mprops, vel, lin_force, ang_force)
    return Velocity(vel.linear + (v.linear - vel.linear) * dt,
                    vel.angular + (v.angular - vel.angular) * dt)


def integrate_velocity(poses: Sim, vels: Velocity, local_com: jax.Array,
                       dt) -> Sim:
    """Semi-implicit Euler pose update about the COM
    (≙ body.wgsl integrateVelocity, 2D + 3D)."""
    from wgmath_tpu.geometry import sim as sim_ops

    dim = poses.translation.shape[-1]
    init_com = sim_ops.mul_pt(poses, local_com)
    init_tra = poses.translation
    if dim == 2:
        delta_ang = rot2.from_angle(vels.angular * dt)
        rotated = rot2.mul_vec(delta_ang, init_tra - init_com)
        new_rot = rot2.normalize(rot2.mul(delta_ang, poses.rotation))
    else:
        delta_ang = quat.from_scaled_axis(vels.angular * dt)
        rotated = quat.mul_vec(delta_ang, init_tra - init_com)
        new_rot = quat.normalize(quat.mul(delta_ang, poses.rotation))
    new_tra = init_com + rotated * poses.scale[..., None] + vels.linear * dt
    return Sim(new_rot, new_tra, poses.scale)


def velocity_at_point(com: jax.Array, vels: Velocity,
                      point: jax.Array) -> jax.Array:
    """≙ body.wgsl velocity_at_point: v + ω × (p - com)."""
    arm = point - com
    if point.shape[-1] == 2:
        perp = jnp.stack([-arm[..., 1], arm[..., 0]], axis=-1)
        return vels.linear + vels.angular[..., None] * perp
    return vels.linear + jnp.cross(vels.angular, arm)


# -- constructors -------------------------------------------------------------


def ball_local_mprops(radius: jax.Array, density: float = 1.0,
                      *, dim: int = 3, dynamic=None) -> LocalMassProperties:
    """Uniform ball/disk mass properties."""
    radius = jnp.asarray(radius, jnp.float32)
    n = radius.shape[0]
    if dim == 3:
        mass = density * (4.0 / 3.0) * jnp.pi * radius**3
        inertia = 0.4 * mass * radius**2  # 2/5 m r²
    else:
        mass = density * jnp.pi * radius**2
        inertia = 0.5 * mass * radius**2
    dyn = jnp.ones(n, bool) if dynamic is None else jnp.asarray(dynamic)
    inv_m = jnp.where(dyn, 1.0 / mass, 0.0)
    inv_i = jnp.where(dyn, 1.0 / inertia, 0.0)
    inv_mass = jnp.repeat(inv_m[:, None], dim, axis=1)
    com = jnp.zeros((n, dim), jnp.float32)
    if dim == 3:
        return LocalMassProperties(inv_mass, com, quat.identity((n,)),
                                   jnp.repeat(inv_i[:, None], 3, axis=1))
    return LocalMassProperties(inv_mass, com, None, inv_i)


def cuboid_local_mprops(half_extents: jax.Array, density: float = 1.0,
                        *, dynamic=None) -> LocalMassProperties:
    """Uniform box mass properties, [N, dim] half extents."""
    he = jnp.asarray(half_extents, jnp.float32)
    n, dim = he.shape
    sides = 2.0 * he
    if dim == 3:
        mass = density * sides[:, 0] * sides[:, 1] * sides[:, 2]
        ix = mass / 12.0 * (sides[:, 1] ** 2 + sides[:, 2] ** 2)
        iy = mass / 12.0 * (sides[:, 0] ** 2 + sides[:, 2] ** 2)
        iz = mass / 12.0 * (sides[:, 0] ** 2 + sides[:, 1] ** 2)
        inertia = jnp.stack([ix, iy, iz], axis=-1)
    else:
        mass = density * sides[:, 0] * sides[:, 1]
        inertia = mass / 12.0 * (sides[:, 0] ** 2 + sides[:, 1] ** 2)
    dyn = jnp.ones(n, bool) if dynamic is None else jnp.asarray(dynamic)
    inv_m = jnp.where(dyn, 1.0 / mass, 0.0)
    inv_mass = jnp.repeat(inv_m[:, None], dim, axis=1)
    com = jnp.zeros((n, dim), jnp.float32)
    if dim == 3:
        inv_i = jnp.where(dyn[:, None], 1.0 / inertia, 0.0)
        return LocalMassProperties(inv_mass, com, quat.identity((n,)), inv_i)
    inv_i = jnp.where(dyn, 1.0 / inertia, 0.0)
    return LocalMassProperties(inv_mass, com, None, inv_i)


def capsule_local_mprops(half_heights, radii, density: float = 1.0,
                         *, dim: int = 3, dynamic=None) -> LocalMassProperties:
    """Capsule mass properties: cylinder/rect plus two hemispheres/half-disks
    (parry MassProperties::from_capsule parity)."""
    hh = jnp.asarray(half_heights, jnp.float32)
    r = jnp.asarray(radii, jnp.float32)
    n = hh.shape[0]
    if dim == 3:
        m_cyl = density * jnp.pi * r**2 * 2.0 * hh
        m_hemi = density * (2.0 / 3.0) * jnp.pi * r**3
        mass = m_cyl + 2.0 * m_hemi
        iy = m_cyl * r**2 / 2.0 + 2.0 * m_hemi * (2.0 / 5.0) * r**2
        c = 3.0 * r / 8.0  # hemisphere COM offset from flat face
        i_hemi_com = (83.0 / 320.0) * m_hemi * r**2
        ix = (m_cyl * (3.0 * r**2 + 4.0 * hh**2) / 12.0
              + 2.0 * (i_hemi_com + m_hemi * (hh + c) ** 2))
        inertia = jnp.stack([ix, iy, ix], axis=-1)
    else:
        m_rect = density * 2.0 * r * 2.0 * hh
        m_half = density * jnp.pi * r**2 / 2.0
        mass = m_rect + 2.0 * m_half
        c = 4.0 * r / (3.0 * jnp.pi)
        i_half_com = m_half * r**2 / 2.0 - m_half * c**2
        inertia = (m_rect * (4.0 * r**2 + 4.0 * hh**2) / 12.0
                   + 2.0 * (i_half_com + m_half * (hh + c) ** 2))
    dyn = jnp.ones(n, bool) if dynamic is None else jnp.asarray(dynamic)
    inv_m = jnp.where(dyn, 1.0 / mass, 0.0)
    inv_mass = jnp.repeat(inv_m[:, None], dim, axis=1)
    com = jnp.zeros((n, dim), jnp.float32)
    if dim == 3:
        inv_i = jnp.where(dyn[:, None], 1.0 / inertia, 0.0)
        return LocalMassProperties(inv_mass, com, quat.identity((n,)), inv_i)
    return LocalMassProperties(inv_mass, com, None,
                               jnp.where(dyn, 1.0 / inertia, 0.0))


def cylinder_local_mprops(half_heights, radii, density: float = 1.0,
                          *, dynamic=None) -> LocalMassProperties:
    """Solid 3D cylinder, axis +Y."""
    hh = jnp.asarray(half_heights, jnp.float32)
    r = jnp.asarray(radii, jnp.float32)
    n = hh.shape[0]
    mass = density * jnp.pi * r**2 * 2.0 * hh
    iy = mass * r**2 / 2.0
    ix = mass * (3.0 * r**2 + 4.0 * hh**2) / 12.0
    dyn = jnp.ones(n, bool) if dynamic is None else jnp.asarray(dynamic)
    inv_m = jnp.where(dyn, 1.0 / mass, 0.0)
    inv_i = jnp.where(dyn[:, None], 1.0 / jnp.stack([ix, iy, ix], -1), 0.0)
    return LocalMassProperties(jnp.repeat(inv_m[:, None], 3, 1),
                               jnp.zeros((n, 3), jnp.float32),
                               quat.identity((n,)), inv_i)


def cone_local_mprops(half_heights, radii, density: float = 1.0,
                      *, dynamic=None) -> LocalMassProperties:
    """Solid 3D cone, apex +half_height; COM sits H/4 above the base."""
    hh = jnp.asarray(half_heights, jnp.float32)
    r = jnp.asarray(radii, jnp.float32)
    n = hh.shape[0]
    big_h = 2.0 * hh
    mass = density * jnp.pi * r**2 * big_h / 3.0
    iy = 0.3 * mass * r**2
    ix = mass * (3.0 * r**2 / 20.0 + 3.0 * big_h**2 / 80.0)
    com = jnp.zeros((n, 3), jnp.float32).at[:, 1].set(-hh / 2.0)
    dyn = jnp.ones(n, bool) if dynamic is None else jnp.asarray(dynamic)
    inv_m = jnp.where(dyn, 1.0 / mass, 0.0)
    inv_i = jnp.where(dyn[:, None], 1.0 / jnp.stack([ix, iy, ix], -1), 0.0)
    return LocalMassProperties(jnp.repeat(inv_m[:, None], 3, 1), com,
                               quat.identity((n,)), inv_i)


def _example_bodies():
    from wgmath_tpu.geometry import sim as sim_ops

    n = 64
    poses = sim_ops.identity((n,), dim=3)
    return (Bodies(poses, Velocity.zero(n, 3),
                   ball_local_mprops(jnp.ones(n), dim=3)),)


register_module(
    KernelModule(
        "dynamics.body",
        deps=("geometry.sim",),
        provides={
            "update_mprops": update_mprops,
            "apply_impulse": apply_impulse,
            "integrate_forces": integrate_forces,
            "integrate_velocity": integrate_velocity,
            "velocity_at_point": velocity_at_point,
        },
        entries={
            "update_mprops": EntryPoint(
                fn=lambda b: update_mprops(b.poses, b.local_mprops),
                example_args=_example_bodies,
            ),
            "integrate": EntryPoint(
                fn=lambda b: integrate_velocity(b.poses, b.vels,
                                                b.local_mprops.com, 1.0 / 60.0),
                example_args=_example_bodies,
            ),
        },
        doc="Rigid-body SoA state + integration (≙ wgrapier dynamics/body).",
    )
)
