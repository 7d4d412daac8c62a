"""Legacy t2m stack: quaternion algebra, FK/IK skeleton, RIC features,
co-embedding evaluator models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conductor_tpu.t2m import param_util
from conductor_tpu.t2m.motion_process import (
    extract_ric_features,
    recover_from_ric,
    recover_root_rot_pos,
)
from conductor_tpu.t2m.quaternion import (
    cont6d_to_matrix,
    euler2quat,
    expmap_to_quaternion,
    qbetween,
    qeuler,
    qfix,
    qinv,
    qmul,
    qnormalize,
    qrot,
    qslerp,
    quaternion_to_cont6d,
    quaternion_to_matrix,
)
from conductor_tpu.t2m.skeleton import Skeleton


def _rand_quat(rng, shape=()):
    q = jax.random.normal(rng, shape + (4,))
    return qnormalize(q)


class TestQuaternion:
    def test_qmul_identity(self):
        rng = jax.random.PRNGKey(0)
        q = _rand_quat(rng, (5,))
        ident = jnp.array([1.0, 0.0, 0.0, 0.0])
        np.testing.assert_allclose(
            np.asarray(qmul(jnp.broadcast_to(ident, q.shape), q)), np.asarray(q),
            atol=1e-6,
        )

    def test_qinv_roundtrip(self):
        rng = jax.random.PRNGKey(1)
        q = _rand_quat(rng, (5,))
        qq = qmul(q, qinv(q))
        np.testing.assert_allclose(np.asarray(qq[..., 0]), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(qq[..., 1:]), 0.0, atol=1e-5)

    def test_qrot_matches_matrix(self):
        rng = jax.random.PRNGKey(2)
        q = _rand_quat(rng, (7,))
        v = jax.random.normal(jax.random.PRNGKey(3), (7, 3))
        got = qrot(q, v)
        want = jnp.einsum("bij,bj->bi", quaternion_to_matrix(q), v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_euler_roundtrip(self):
        e = jnp.array([[10.0, 20.0, 30.0], [-40.0, 5.0, 60.0]])
        q = euler2quat(e, "xyz", deg=True)
        back = qeuler(q, "xyz", deg=True)
        np.testing.assert_allclose(np.asarray(back), np.asarray(e), atol=1e-4)

    def test_cont6d_roundtrip(self):
        rng = jax.random.PRNGKey(4)
        q = _rand_quat(rng, (6,))
        m = quaternion_to_matrix(q)
        m2 = cont6d_to_matrix(quaternion_to_cont6d(q))
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-5)

    def test_qfix_continuity(self):
        rng = jax.random.PRNGKey(5)
        q = _rand_quat(rng, (10, 2))
        q = q.at[3].multiply(-1).at[7].multiply(-1)  # inject sign flips
        fixed = qfix(q)
        dots = np.sum(np.asarray(fixed[1:]) * np.asarray(fixed[:-1]), axis=-1)
        assert (dots >= 0).all()

    def test_qslerp_endpoints(self):
        rng = jax.random.PRNGKey(6)
        q0 = _rand_quat(rng, (4,))
        q1 = _rand_quat(jax.random.PRNGKey(7), (4,))
        s0 = np.abs(np.sum(np.asarray(qslerp(q0, q1, 0.0)) * np.asarray(q0), -1))
        s1 = np.abs(np.sum(np.asarray(qslerp(q0, q1, 1.0)) * np.asarray(q1), -1))
        np.testing.assert_allclose(s0, 1.0, atol=1e-4)
        np.testing.assert_allclose(s1, 1.0, atol=1e-4)

    def test_qbetween(self):
        v0 = jnp.array([[1.0, 0.0, 0.0]])
        v1 = jnp.array([[0.0, 1.0, 0.0]])
        q = qbetween(v0, v1)
        rotated = qrot(q, v0)
        np.testing.assert_allclose(np.asarray(rotated), np.asarray(v1), atol=1e-6)

    def test_expmap(self):
        e = jnp.array([[np.pi / 2, 0.0, 0.0]])  # 90 deg about x
        q = expmap_to_quaternion(e)
        v = qrot(q, jnp.array([[0.0, 1.0, 0.0]]))
        np.testing.assert_allclose(
            np.asarray(v), np.array([[0.0, 0.0, 1.0]]), atol=1e-5
        )


@pytest.fixture(scope="module")
def t2m_skeleton():
    return Skeleton(param_util.t2m_raw_offsets, param_util.t2m_kinematic_chain)


@pytest.fixture(scope="module")
def rest_pose(t2m_skeleton):
    """A plausible rest pose: FK of identity rotations over unit offsets."""
    J = t2m_skeleton.njoints()
    t2m_skeleton.set_offset(np.asarray(param_util.t2m_raw_offsets, np.float32) * 0.3)
    ident = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (1, J, 4))
    return t2m_skeleton.forward_kinematics(ident, jnp.zeros((1, 3)))[0]


class TestSkeleton:
    def test_fk_ik_roundtrip(self, t2m_skeleton, rest_pose):
        # Perturb the pose with small random rotations, FK, then IK -> FK again
        rng = jax.random.PRNGKey(8)
        J = t2m_skeleton.njoints()
        small = qnormalize(
            jnp.concatenate(
                [jnp.ones((4, J, 1)), 0.05 * jax.random.normal(rng, (4, J, 3))],
                axis=-1,
            )
        )
        root_pos = jnp.zeros((4, 3))
        joints = t2m_skeleton.forward_kinematics(small, root_pos)
        # face joints for t2m: r_hip=2, l_hip=1, sdr_r=17, sdr_l=16
        quat = t2m_skeleton.inverse_kinematics(joints, (2, 1, 17, 16))
        joints2 = t2m_skeleton.forward_kinematics(quat, root_pos)
        np.testing.assert_allclose(
            np.asarray(joints2), np.asarray(joints), atol=2e-2
        )

    def test_fk_cont6d_matches_quat(self, t2m_skeleton):
        rng = jax.random.PRNGKey(9)
        J = t2m_skeleton.njoints()
        q = qnormalize(jax.random.normal(rng, (2, J, 4)))
        root = jax.random.normal(jax.random.PRNGKey(10), (2, 3))
        j_q = t2m_skeleton.forward_kinematics(q, root)
        j_6 = t2m_skeleton.forward_kinematics_cont6d(quaternion_to_cont6d(q), root)
        np.testing.assert_allclose(np.asarray(j_6), np.asarray(j_q), atol=1e-4)

    def test_offsets_from_reference_pose(self, t2m_skeleton, rest_pose):
        offs = t2m_skeleton.get_offsets_joints(rest_pose)
        assert offs.shape == (22, 3)
        # bone lengths match the rest pose distances
        parents = t2m_skeleton.parents()
        for j in range(1, 22):
            np.testing.assert_allclose(
                float(jnp.linalg.norm(offs[j])),
                float(jnp.linalg.norm(rest_pose[j] - rest_pose[parents[j]])),
                atol=1e-5,
            )


class TestMotionProcess:
    def test_recover_root_static(self):
        # zero velocities, constant height 1 -> identity rotation, y=1
        T = 5
        data = np.zeros((T, 4 + 21 * 3))
        data[:, 3] = 1.0
        r_quat, r_pos = recover_root_rot_pos(jnp.asarray(data))
        np.testing.assert_allclose(np.asarray(r_quat[..., 0]), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(r_pos[..., 1]), 1.0, atol=1e-6)

    def test_extract_then_recover(self, t2m_skeleton, rest_pose):
        # A forward-walking root on a fixed pose: features should recover the
        # global joint trajectory up to the representation's accuracy.
        T = 12
        base = np.asarray(rest_pose)
        base = base - base[0:1]  # root at origin
        base[:, 1] += 1.0
        positions = np.stack([base + np.array([0.0, 0.0, 0.05 * t]) for t in range(T)])
        feats = extract_ric_features(
            positions, 0.002,
            param_util.t2m_raw_offsets, param_util.t2m_kinematic_chain,
            (2, 1, 17, 16), fid_r=[8, 11], fid_l=[7, 10],
        )
        assert feats.shape == (T - 1, 4 + 21 * 3 + 21 * 6 + 22 * 3 + 4)
        rec = recover_from_ric(jnp.asarray(feats), 22)
        assert rec.shape == (T - 1, 22, 3)
        # recovered z-velocity of the root ~ 0.05 per frame
        dz = np.diff(np.asarray(rec)[:, 0, 2])
        np.testing.assert_allclose(dz, 0.05, atol=5e-3)


class TestEvaluatorModels:
    def test_wrapper_shapes_and_order(self):
        from conductor_tpu.t2m.evaluator_models import T2MEvaluatorWrapper

        w = T2MEvaluatorWrapper("t2m")
        w.init(jax.random.PRNGKey(0))
        B, T = 3, 32
        motions = np.random.RandomState(0).rand(B, T, 263).astype(np.float32)
        m_lens = np.array([32, 16, 24])
        emb = w.get_motion_embeddings(motions, m_lens)
        assert emb.shape == (B, 512)
        # unlike the reference, embeddings stay input-ordered; padding beyond
        # the valid length (+ the conv receptive field) must not leak in
        motions2 = motions.copy()
        motions2[1, 24:] = 999.0  # junk beyond length 16 + conv halo
        emb2 = w.get_motion_embeddings(motions2, m_lens)
        np.testing.assert_allclose(emb[1], emb2[1], atol=1e-4)

    def test_co_embeddings(self):
        from conductor_tpu.t2m.evaluator_models import T2MEvaluatorWrapper

        w = T2MEvaluatorWrapper("t2m")
        w.init(jax.random.PRNGKey(1))
        B = 2
        words = np.random.RandomState(1).rand(B, 10, 300).astype(np.float32)
        pos = np.zeros((B, 10, 15), np.float32)
        text_emb, motion_emb = w.get_co_embeddings(
            words, pos, np.array([10, 6]),
            np.random.RandomState(2).rand(B, 32, 263).astype(np.float32),
            np.array([32, 32]),
        )
        assert text_emb.shape == (B, 512) and motion_emb.shape == (B, 512)

    def test_raises_for_music_dataset(self):
        from conductor_tpu.t2m.evaluator_models import T2MEvaluatorWrapper

        with pytest.raises(KeyError):
            T2MEvaluatorWrapper("ConductorMotion100")


class TestText2MotionDataset:
    def test_load_crop_and_tokens(self, tmp_path):
        from conductor_tpu.t2m.dataset import Text2MotionDataset

        motion_dir = tmp_path / "joints"
        text_dir = tmp_path / "texts"
        motion_dir.mkdir()
        text_dir.mkdir()
        rs = np.random.RandomState(0)
        for name, length in [("m1", 60), ("m2", 100), ("short", 10)]:
            np.save(motion_dir / f"{name}.npy", rs.rand(length, 263))
            (text_dir / f"{name}.txt").write_text(
                "a person walks#a/DET person/NOUN walks/VERB#0.0#0.0\n"
            )
        split = tmp_path / "split.txt"
        split.write_text("m1\nm2\nshort\nmissing\n")

        mean = np.zeros(263, np.float32)
        std = np.ones(263, np.float32)
        ds = Text2MotionDataset(
            str(motion_dir), str(text_dir), str(split), mean, std, seed=1
        )
        # 'short' filtered (<40 frames), 'missing' skipped
        assert len(ds) == 2
        caption, motion, m_length = ds[0]
        assert caption == "a person walks"
        assert motion.shape == (196, 263)
        assert m_length % 4 == 0 and m_length <= 100
        # padding beyond m_length is zeros
        assert np.abs(motion[m_length:]).max() == 0.0

    def test_times_multiplies_length(self, tmp_path):
        from conductor_tpu.t2m.dataset import Text2MotionDataset

        motion_dir = tmp_path / "joints"
        text_dir = tmp_path / "texts"
        motion_dir.mkdir()
        text_dir.mkdir()
        np.save(motion_dir / "m1.npy", np.random.RandomState(0).rand(60, 263))
        (text_dir / "m1.txt").write_text("hi#hi/OTHER#0.0#0.0\n")
        split = tmp_path / "split.txt"
        split.write_text("m1\n")
        ds = Text2MotionDataset(
            str(motion_dir), str(text_dir), str(split),
            np.zeros(263), np.ones(263), times=3,
        )
        assert len(ds) == 3


class TestProcessFile:
    """`uniform_skeleton` / `process_file` (`motion_process.py:13-35,156-326`)
    — the last D15 gap."""

    def _walking_motion(self, T=40):
        """A synthetic global-joint motion: rest pose drifting in x with a
        slow yaw and small per-joint wobble."""
        skel = Skeleton(param_util.t2m_raw_offsets, param_util.t2m_kinematic_chain)
        J = skel.njoints()
        skel.set_offset(np.asarray(param_util.t2m_raw_offsets, np.float32) * 0.25)
        rng = jax.random.PRNGKey(11)
        q = qnormalize(
            jnp.concatenate(
                [jnp.ones((T, J, 1)), 0.03 * jax.random.normal(rng, (T, J, 3))],
                axis=-1,
            )
        )
        root = jnp.stack(
            [jnp.linspace(0, 0.5, T), 0.9 + jnp.zeros(T), 0.1 * jnp.linspace(0, 1, T)],
            axis=-1,
        )
        return np.asarray(skel.forward_kinematics(q, root))

    def test_uniform_skeleton_retargets_bone_lengths(self):
        from conductor_tpu.t2m.motion_process import uniform_skeleton

        positions = self._walking_motion()
        tgt = np.asarray(param_util.t2m_raw_offsets, np.float32) * 0.4
        out = uniform_skeleton(
            positions, tgt, param_util.t2m_raw_offsets,
            param_util.t2m_kinematic_chain,
        )
        assert out.shape == positions.shape
        # every bone in the output has the target skeleton's length
        skel = Skeleton(param_util.t2m_raw_offsets, param_util.t2m_kinematic_chain)
        parents = skel.parents()
        for j in range(1, 22):
            np.testing.assert_allclose(
                np.linalg.norm(out[0, j] - out[0, parents[j]]),
                np.linalg.norm(tgt[j]),
                atol=1e-4,
            )
        # root trajectory scaled by the leg-length ratio (0.4/0.25)
        np.testing.assert_allclose(
            out[:, 0], positions[:, 0] * (0.4 / 0.25), atol=1e-5
        )

    def test_process_file_shapes_and_normalization(self):
        from conductor_tpu.t2m.motion_process import process_file

        positions = self._walking_motion(T=30)
        tgt = np.asarray(param_util.t2m_raw_offsets, np.float32) * 0.25
        data, glob, local, l_vel = process_file(
            positions, 0.002, tgt, param_util.t2m_raw_offsets,
            param_util.t2m_kinematic_chain,
        )
        T, J = 30, 22
        assert data.shape == (T - 1, 4 + (J - 1) * 3 + (J - 1) * 6 + J * 3 + 4)
        assert glob.shape == (T, J, 3)
        assert l_vel.shape == (T - 1, 2)
        # put on floor: min y == 0; root starts at XZ origin
        np.testing.assert_allclose(glob[:, :, 1].min(), 0.0, atol=1e-5)
        np.testing.assert_allclose(glob[0, 0, [0, 2]], 0.0, atol=1e-5)
        assert np.isfinite(data).all()

    def test_process_file_recover_roundtrip(self):
        """recover_from_ric inverts the feature extraction to tolerance."""
        from conductor_tpu.t2m.motion_process import process_file, recover_from_ric

        positions = self._walking_motion(T=30)
        tgt = np.asarray(param_util.t2m_raw_offsets, np.float32) * 0.25
        data, glob, _, _ = process_file(
            positions, 0.002, tgt, param_util.t2m_raw_offsets,
            param_util.t2m_kinematic_chain,
        )
        rec = np.asarray(recover_from_ric(jnp.asarray(data), 22))
        # yaw integration accumulates small drift; the pose itself must match
        np.testing.assert_allclose(rec, glob[: len(rec)], atol=0.08)
