"""HumanML3D motion feature extraction / recovery (reference
`utils/motion_process.py:38-397`), as jnp functions.

Feature layout per frame (dim = 4 + (J-1)*3 + (J-1)*6 + J*3 + 4):

    [root_rot_vel(1) | root_lin_vel_xz(2) | root_y(1) |
     ric (J-1)*3 | rot6d (J-1)*6 | local_vel J*3 | feet contacts 4]

`recover_from_ric` / `recover_from_rot` invert the representation back to
global joint positions; both are jittable (the cumulative sums over time are
`jnp.cumsum`, not Python loops).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .quaternion import (
    qfix,
    qinv,
    qmul,
    qrot,
    quaternion_to_cont6d,
)
from .skeleton import Skeleton


def recover_root_rot_pos(data: jnp.ndarray):
    """Integrate root yaw / planar velocities back to rotation + position
    (`motion_process.py:328-348`).  data (..., T, D) with channel 0 the yaw
    velocity, 1:3 the xz velocity, 3 the root height."""
    data = jnp.asarray(data)
    rot_vel = data[..., 0]
    r_rot_ang = jnp.cumsum(
        jnp.concatenate(
            [jnp.zeros_like(rot_vel[..., :1]), rot_vel[..., :-1]], axis=-1
        ),
        axis=-1,
    )
    zeros = jnp.zeros_like(r_rot_ang)
    r_rot_quat = jnp.stack(
        [jnp.cos(r_rot_ang), zeros, jnp.sin(r_rot_ang), zeros], axis=-1
    )

    r_pos_xz = jnp.concatenate(
        [jnp.zeros_like(data[..., :1, 1:3]), data[..., :-1, 1:3]], axis=-2
    )
    r_pos = jnp.stack(
        [r_pos_xz[..., 0], jnp.zeros_like(r_pos_xz[..., 0]), r_pos_xz[..., 1]],
        axis=-1,
    )
    r_pos = qrot(qinv(r_rot_quat), r_pos)
    r_pos = jnp.cumsum(r_pos, axis=-2)
    r_pos = r_pos.at[..., 1].set(data[..., 3])
    return r_rot_quat, r_pos


def recover_from_ric(data: jnp.ndarray, joints_num: int) -> jnp.ndarray:
    """RIC features (..., T, D) -> joint positions (..., T, J, 3)
    (`motion_process.py:367-384`)."""
    data = jnp.asarray(data)
    r_rot_quat, r_pos = recover_root_rot_pos(data)
    positions = data[..., 4 : (joints_num - 1) * 3 + 4]
    positions = positions.reshape(positions.shape[:-1] + (-1, 3))
    positions = qrot(
        jnp.broadcast_to(
            qinv(r_rot_quat)[..., None, :], positions.shape[:-1] + (4,)
        ),
        positions,
    )
    positions = positions.at[..., 0].add(r_pos[..., 0:1])
    positions = positions.at[..., 2].add(r_pos[..., 2:3])
    return jnp.concatenate([r_pos[..., None, :], positions], axis=-2)


def recover_from_rot(
    data: jnp.ndarray, joints_num: int, skeleton: Skeleton
) -> jnp.ndarray:
    """6-D rotation features -> joint positions via FK
    (`motion_process.py:350-364`)."""
    data = jnp.asarray(data)
    r_rot_quat, r_pos = recover_root_rot_pos(data)
    r_rot_cont6d = quaternion_to_cont6d(r_rot_quat)
    start = 1 + 2 + 1 + (joints_num - 1) * 3
    end = start + (joints_num - 1) * 6
    cont6d = jnp.concatenate([r_rot_cont6d, data[..., start:end]], axis=-1)
    cont6d = cont6d.reshape(-1, joints_num, 6)
    return skeleton.forward_kinematics_cont6d(cont6d, r_pos.reshape(-1, 3))


def extract_ric_features(
    positions: np.ndarray,
    feet_thre: float,
    n_raw_offsets: np.ndarray,
    kinematic_chain,
    face_joint_indx,
    fid_r,
    fid_l,
) -> np.ndarray:
    """Global joint positions (T, J, 3) -> (T-1, D) feature frames
    (`motion_process.py:38-156` `extract_features`).  Host-side data prep —
    runs once per clip offline, so numpy in/out with jnp math inside."""
    positions = np.asarray(positions, dtype=np.float32)
    global_positions = positions.copy()

    # foot contacts from squared frame-to-frame displacement
    def foot_contacts(fid):
        d2 = ((positions[1:, fid] - positions[:-1, fid]) ** 2).sum(axis=-1)
        return (d2 < feet_thre).astype(np.float32)

    feet_l, feet_r = foot_contacts(fid_l), foot_contacts(fid_r)

    skel = Skeleton(n_raw_offsets, kinematic_chain)
    quat_params = qfix(
        skel.inverse_kinematics(positions, face_joint_indx, smooth_forward=True)
    )
    cont6d_params = quaternion_to_cont6d(quat_params)
    r_rot = quat_params[:, 0]

    velocity = qrot(r_rot[1:], jnp.asarray(positions[1:, 0] - positions[:-1, 0]))
    r_velocity = qmul(r_rot[1:], qinv(r_rot[:-1]))

    # root-relative, facing-Z+ local pose
    local = positions.copy()
    local[..., 0] -= local[:, 0:1, 0]
    local[..., 2] -= local[:, 0:1, 2]
    local = qrot(
        jnp.broadcast_to(r_rot[:, None], (local.shape[0], local.shape[1], 4)),
        jnp.asarray(local),
    )

    root_y = np.asarray(local)[:, 0, 1:2]
    root_data = np.concatenate(
        [
            np.arcsin(np.asarray(r_velocity)[:, 2:3]),
            np.asarray(velocity)[:, [0, 2]],
            root_y[:-1],
        ],
        axis=-1,
    )
    ric_data = np.asarray(local)[:, 1:].reshape(len(positions), -1)
    rot_data = np.asarray(cont6d_params)[:, 1:].reshape(len(positions), -1)
    local_vel = qrot(
        jnp.broadcast_to(
            r_rot[:-1, None], (len(positions) - 1, positions.shape[1], 4)
        ),
        jnp.asarray(global_positions[1:] - global_positions[:-1]),
    )
    local_vel = np.asarray(local_vel).reshape(len(positions) - 1, -1)

    return np.concatenate(
        [root_data, ric_data[:-1], rot_data[:-1], local_vel, feet_l, feet_r],
        axis=-1,
    )
