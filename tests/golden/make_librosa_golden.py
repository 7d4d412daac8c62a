"""Record librosa's beat tracker on the canonical synthetic clips.

Run this ON A MACHINE THAT HAS LIBROSA (this image does not ship it):

    python tests/golden/make_librosa_golden.py \
        [--out tests/fixtures/librosa_beats.npz]

It synthesizes the clips from `tests/beat_synth.GOLDEN_CLIPS`, pushes each
through the repo's own wav->mel pipeline, runs the reference BC metric's
exact tracker (`librosa.beat.beat_track` on `librosa.onset.onset_strength`,
matching `/root/reference/Diffusion_Stage/tools/eval_new_metrics.py:
319-340`), and writes one (T90,) one-hot beat array per clip plus the
librosa version string.  `tests/test_metrics.py::
TestBeatTrackerGolden::test_librosa_agreement_fixture` picks the fixture up
automatically and pins the in-repo Ellis-DP fallback's F-measure against it.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "tests", "fixtures",
                                      "librosa_beats.npz")
    )
    args = ap.parse_args()

    import librosa  # hard requirement, by design

    from beat_synth import golden_mels

    payload = {"librosa_version": np.array(librosa.__version__)}
    for name, mel in golden_mels().items():
        fps, hop_length = 90, 512
        sr = fps * hop_length
        env = librosa.onset.onset_strength(S=mel.T, sr=sr)
        _, beat_idxs = librosa.beat.beat_track(
            onset_envelope=env, sr=sr, hop_length=hop_length, tightness=100.0
        )
        onehot = np.zeros(mel.shape[0], dtype=np.float32)
        onehot[np.asarray(beat_idxs, dtype=int)] = 1.0
        payload[name] = onehot
    np.savez(args.out, **payload)
    print(f"wrote {args.out}: {sorted(k for k in payload if k != 'librosa_version')}")


if __name__ == "__main__":
    main()
