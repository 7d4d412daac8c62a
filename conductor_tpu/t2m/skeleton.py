"""Forward/inverse kinematics over kinematic chains (reference
`utils/skeleton.py:4-199`), functional-JAX style.

One implementation serves host and device (the torch original keeps `_np`
twins of every method).  Chains are static Python structure, so the per-chain
loops unroll at trace time into pure jnp ops — jittable and vmappable over
the batch dim.  Joint positions are accumulated functionally (`.at[].set`)
instead of in-place writes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .quaternion import (
    cont6d_to_matrix,
    qbetween,
    qinv,
    qmul,
    qnormalize,
    qrot,
)


class Skeleton:
    """offset: (J, 3) unit bone directions; kinematic_tree: list of chains
    (each starting at its parent joint, root chain starting at 0)."""

    def __init__(self, offset, kinematic_tree):
        self._raw_offset = jnp.asarray(offset, dtype=jnp.float32)
        self._kinematic_tree = [list(c) for c in kinematic_tree]
        self._offset = None
        self._parents = [0] * self._raw_offset.shape[0]
        self._parents[0] = -1
        for chain in self._kinematic_tree:
            for j in range(1, len(chain)):
                self._parents[chain[j]] = chain[j - 1]

    def njoints(self) -> int:
        return int(self._raw_offset.shape[0])

    def kinematic_tree(self):
        return self._kinematic_tree

    def parents(self):
        return self._parents

    def offset(self):
        return self._offset

    def set_offset(self, offsets) -> None:
        self._offset = jnp.asarray(offsets, dtype=jnp.float32)

    def get_offsets_joints(self, joints) -> jnp.ndarray:
        """Scale unit bone directions by the bone lengths of a reference pose
        (J, 3) (`skeleton.py:42-50`)."""
        joints = jnp.asarray(joints)
        parents = np.array(self._parents)
        parents_safe = np.where(parents < 0, 0, parents)
        lengths = jnp.linalg.norm(joints - joints[parents_safe], axis=-1)
        lengths = lengths.at[0].set(0.0)
        offsets = self._raw_offset * lengths[:, None]
        self._offset = offsets
        return offsets

    def inverse_kinematics(
        self, joints, face_joint_idx, smooth_forward: bool = False
    ) -> jnp.ndarray:
        """Global joint positions (T, J, 3) -> per-joint local quaternions
        (T, J, 4) (`skeleton.py:56-100`).  ``face_joint_idx`` =
        (r_hip, l_hip, r_sdr, l_sdr) defines the facing direction; frame 0's
        root rotation is pinned to identity like the reference."""
        joints = jnp.asarray(joints)
        r_hip, l_hip, sdr_r, sdr_l = face_joint_idx
        across = (joints[:, r_hip] - joints[:, l_hip]) + (
            joints[:, sdr_r] - joints[:, sdr_l]
        )
        across = across / jnp.linalg.norm(across, axis=-1, keepdims=True)
        forward = jnp.cross(jnp.array([[0.0, 1.0, 0.0]]), across)
        if smooth_forward:
            from scipy.ndimage import gaussian_filter1d

            forward = jnp.asarray(
                gaussian_filter1d(np.asarray(forward), 20, axis=0, mode="nearest")
            )
        forward = forward / jnp.linalg.norm(forward, axis=-1, keepdims=True)

        target = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), forward.shape)
        root_quat = qbetween(forward, target)
        root_quat = root_quat.at[0].set(jnp.array([1.0, 0.0, 0.0, 0.0]))

        quat_params = jnp.zeros(joints.shape[:-1] + (4,))
        quat_params = quat_params.at[:, 0].set(root_quat)
        for chain in self._kinematic_tree:
            R = root_quat
            for j in range(len(chain) - 1):
                u = jnp.broadcast_to(
                    self._raw_offset[chain[j + 1]], (joints.shape[0], 3)
                )
                v = joints[:, chain[j + 1]] - joints[:, chain[j]]
                v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
                rot_u_v = qbetween(u, v)
                R_loc = qmul(qinv(R), rot_u_v)
                quat_params = quat_params.at[:, chain[j + 1]].set(R_loc)
                R = qmul(R, R_loc)
        return quat_params

    def _resolve_offsets(self, batch: int, skel_joints):
        if skel_joints is not None:
            offsets = jnp.stack(
                [self.get_offsets_joints(skel_joints[i]) for i in range(len(skel_joints))]
            )
        elif self._offset is not None and self._offset.ndim == 2:
            offsets = jnp.broadcast_to(
                self._offset, (batch,) + self._offset.shape
            )
        else:
            offsets = self._offset
        return offsets

    def forward_kinematics(
        self, quat_params, root_pos, skel_joints=None, do_root_R: bool = True
    ) -> jnp.ndarray:
        """Local quaternions (B, J, 4) + root positions (B, 3) -> global joint
        positions (B, J, 3) (`skeleton.py:103-123`)."""
        quat_params = jnp.asarray(quat_params)
        root_pos = jnp.asarray(root_pos)
        B = quat_params.shape[0]
        offsets = self._resolve_offsets(B, skel_joints)
        joints = jnp.zeros(quat_params.shape[:-1] + (3,))
        joints = joints.at[:, 0].set(root_pos)
        for chain in self._kinematic_tree:
            if do_root_R:
                R = quat_params[:, 0]
            else:
                R = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0, 0.0]), (B, 4))
            for i in range(1, len(chain)):
                R = qmul(R, quat_params[:, chain[i]])
                joints = joints.at[:, chain[i]].set(
                    qrot(qnormalize(R), offsets[:, chain[i]])
                    + joints[:, chain[i - 1]]
                )
        return joints

    def forward_kinematics_cont6d(
        self, cont6d_params, root_pos, skel_joints=None, do_root_R: bool = True
    ) -> jnp.ndarray:
        """6-D rotation params (B, J, 6) + root positions -> joint positions
        (`skeleton.py:149-199`)."""
        cont6d_params = jnp.asarray(cont6d_params)
        root_pos = jnp.asarray(root_pos)
        B = cont6d_params.shape[0]
        offsets = self._resolve_offsets(B, skel_joints)
        joints = jnp.zeros(cont6d_params.shape[:-1] + (3,))
        joints = joints.at[:, 0].set(root_pos)
        for chain in self._kinematic_tree:
            if do_root_R:
                matR = cont6d_to_matrix(cont6d_params[:, 0])
            else:
                matR = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
            for i in range(1, len(chain)):
                matR = matR @ cont6d_to_matrix(cont6d_params[:, chain[i]])
                joints = joints.at[:, chain[i]].set(
                    (matR @ offsets[:, chain[i], :, None])[..., 0]
                    + joints[:, chain[i - 1]]
                )
        return joints
