from scx.physics.rigid import (
    RigidBodies,
    make_bodies,
    inv_inertia_world,
    body_aabbs,
    integrate_velocities,
    integrate_positions,
)
from scx.physics.broadphase import broadphase_pairs
from scx.physics.contacts import generate_contacts, Contacts
from scx.physics.solver import (
    solve_velocity,
    step_bodies,
    step_bodies_cached,
    SolverParams,
)
from scx.physics.warmstart import ContactCache, empty_contact_cache
from scx.physics.queries import raycast, sphere_cast, capsule_cast, RayHit
from scx.physics.vehicle import (
    WheelConfig,
    VehicleParams,
    default_wheel_configs,
    vehicle_forces,
)
