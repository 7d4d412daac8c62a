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


# HumanML3D preprocessing constants.  The reference's `uniform_skeleton` /
# `process_file` (`motion_process.py:13-35,156-326`) read these as module
# globals that are never defined in the file (they come from the HumanML3D
# notebook namespace — the functions NameError standalone); here they are
# explicit, with the published HumanML3D values as defaults.
T2M_LEFT_LEG = (5, 8)            # l_idx1, l_idx2
T2M_FID_R = (8, 11)              # right-foot joints
T2M_FID_L = (7, 10)              # left-foot joints
T2M_FACE_JOINTS = (2, 1, 17, 16)  # r_hip, l_hip, sdr_r, sdr_l


def uniform_skeleton(
    positions: np.ndarray,
    target_offset,
    n_raw_offsets: np.ndarray,
    kinematic_chain,
    *,
    face_joint_indx=T2M_FACE_JOINTS,
    l_idx1: int = T2M_LEFT_LEG[0],
    l_idx2: int = T2M_LEFT_LEG[1],
) -> np.ndarray:
    """Retarget a motion onto the canonical skeleton (`motion_process.py:13-35`):
    scale the root trajectory by the leg-length ratio, IK to local
    quaternions on the source bones, FK back on the target bones."""
    positions = np.asarray(positions, dtype=np.float32)
    skel = Skeleton(n_raw_offsets, kinematic_chain)
    src_offset = np.asarray(skel.get_offsets_joints(jnp.asarray(positions[0])))
    tgt_offset = np.asarray(target_offset, dtype=np.float32)

    # scale = target leg length / source leg length
    src_leg_len = np.abs(src_offset[l_idx1]).max() + np.abs(src_offset[l_idx2]).max()
    tgt_leg_len = np.abs(tgt_offset[l_idx1]).max() + np.abs(tgt_offset[l_idx2]).max()
    scale_rt = tgt_leg_len / src_leg_len
    tgt_root_pos = positions[:, 0] * scale_rt

    quat_params = skel.inverse_kinematics(positions, face_joint_indx)
    skel.set_offset(tgt_offset)
    new_joints = skel.forward_kinematics(quat_params, jnp.asarray(tgt_root_pos))
    return np.asarray(new_joints)


def process_file(
    positions: np.ndarray,
    feet_thre: float,
    tgt_offsets,
    n_raw_offsets: np.ndarray,
    kinematic_chain,
    *,
    face_joint_indx=T2M_FACE_JOINTS,
    fid_r=T2M_FID_R,
    fid_l=T2M_FID_L,
    l_idx1: int = T2M_LEFT_LEG[0],
    l_idx2: int = T2M_LEFT_LEG[1],
):
    """Raw global joints (T, J, 3) -> the full HumanML3D feature pipeline
    (`motion_process.py:156-326`): uniform skeleton, put on floor, root XZ to
    origin, initial facing to Z+, then feature extraction.  Returns
    ``(data, global_positions, local_positions, l_velocity)`` like the
    reference."""
    from .quaternion import qbetween

    positions = uniform_skeleton(
        positions, tgt_offsets, n_raw_offsets, kinematic_chain,
        face_joint_indx=face_joint_indx, l_idx1=l_idx1, l_idx2=l_idx2,
    )

    # put on floor; root XZ at origin
    positions = positions - np.array([0.0, positions[:, :, 1].min(), 0.0])
    root_pos_init = positions[0]
    positions = positions - root_pos_init[0] * np.array([1.0, 0.0, 1.0])

    # rotate so the initial pose faces Z+
    r_hip, l_hip, sdr_r, sdr_l = face_joint_indx
    across = (root_pos_init[r_hip] - root_pos_init[l_hip]) + (
        root_pos_init[sdr_r] - root_pos_init[sdr_l]
    )
    across = across / np.sqrt((across**2).sum())
    forward_init = np.cross(np.array([0.0, 1.0, 0.0]), across)
    forward_init = forward_init / np.sqrt((forward_init**2).sum())
    root_quat_init = np.asarray(
        qbetween(jnp.asarray(forward_init[None]), jnp.asarray([[0.0, 0.0, 1.0]]))
    )
    positions = np.asarray(
        qrot(
            jnp.broadcast_to(
                jnp.asarray(root_quat_init), positions.shape[:-1] + (4,)
            ),
            jnp.asarray(positions),
        )
    )

    return extract_features_full(
        positions, feet_thre, n_raw_offsets, kinematic_chain,
        face_joint_indx, fid_r, fid_l,
    )


def extract_features_full(
    positions: np.ndarray,
    feet_thre: float,
    n_raw_offsets: np.ndarray,
    kinematic_chain,
    face_joint_indx,
    fid_r,
    fid_l,
):
    """`extract_features` with the reference `process_file`'s full return
    tuple ``(data, global_positions, local_positions, l_velocity)``."""
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

    data = np.concatenate(
        [root_data, ric_data[:-1], rot_data[:-1], local_vel, feet_l, feet_r],
        axis=-1,
    )
    return data, global_positions, np.asarray(local), np.asarray(velocity)[:, [0, 2]]


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
    (`motion_process.py:38-153` `extract_features`).  Host-side data prep —
    runs once per clip offline, so numpy in/out with jnp math inside."""
    return extract_features_full(
        positions, feet_thre, n_raw_offsets, kinematic_chain,
        face_joint_indx, fid_r, fid_l,
    )[0]
