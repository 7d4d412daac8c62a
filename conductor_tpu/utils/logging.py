"""Training observability: console + JSONL metric logging (TensorBoard if present).

The reference logs stage 1 to TensorBoard (`M2SNet_train.py:106-111`) and
stage 2 only to stdout via `print_current_loss`
(`Diffusion_Stage/utils/utils.py:36-58`).  Here one `MetricLogger` serves all
trainers: every scalar goes to an append-only `metrics.jsonl` (machine
readable, crash safe) and a rate-limited console line; TensorBoard event
files are written too when a writer implementation is importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Mapping


def format_time(seconds: float) -> str:
    """hh:mm:ss (the reference's `as_minutes`/`time_since`, `utils.py:19-33`)."""
    s = int(seconds)
    return f"{s // 3600:02d}:{(s % 3600) // 60:02d}:{s % 60:02d}"


class MetricLogger:
    def __init__(self, log_dir: str, *, console_every: int = 5, name: str = "train"):
        self.log_dir = log_dir
        self.console_every = console_every
        self.name = name
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a", buffering=1)
        self._start = time.time()
        self._tb = self._try_tensorboard(log_dir)
        self._accum: dict[str, float] = {}
        self._accum_n = 0

    @staticmethod
    def _try_tensorboard(log_dir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            return SummaryWriter(log_dir=log_dir)
        except Exception:
            return None

    def log(self, step: int, metrics: Mapping[str, float], *, epoch: int | None = None):
        record = {"step": int(step), "t": round(time.time() - self._start, 3)}
        if epoch is not None:
            record["epoch"] = int(epoch)
        for k, v in metrics.items():
            v = float(v)
            record[k] = v
            self._accum[k] = self._accum.get(k, 0.0) + v
            if self._tb is not None:
                self._tb.add_scalar(f"{self.name}/{k}", v, step)
        self._jsonl.write(json.dumps(record) + "\n")
        self._accum_n += 1

        if step % self.console_every == 0 and self._accum_n:
            means = {k: v / self._accum_n for k, v in self._accum.items()}
            parts = " | ".join(f"{k}: {v:.5f}" for k, v in means.items())
            ep = f"epoch: {epoch} | " if epoch is not None else ""
            print(f"[{format_time(time.time() - self._start)}] {ep}step: {step} | {parts}")
            self._accum, self._accum_n = {}, 0

    # ------------------------------------------------------------- images
    # The reference's main training-health instrument: feature-map heatmaps
    # and real-vs-fake motion trace plots pushed to TensorBoard every eval
    # (`M2SNet_eval.py:97-116`, `utils/train_utils.py:104-150`).  Rendered
    # straight to arrays (the reference round-trips through a temp PNG file
    # plus a sleep); images also land as PNGs under <log_dir>/images/ so
    # they're inspectable without TensorBoard.

    def log_image(self, step: int, tag: str, img) -> None:
        """img: (H, W, 3) uint8 (or float in [0, 1])."""
        import numpy as np

        img = np.asarray(img)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
        if self._tb is not None:
            self._tb.add_image(tag, img, step, dataformats="HWC")
        img_dir = os.path.join(self.log_dir, "images")
        os.makedirs(img_dir, exist_ok=True)
        safe = tag.replace("/", "_").replace(" ", "_")
        path = os.path.join(img_dir, f"{safe}_{step:08d}.png")
        try:
            import matplotlib

            matplotlib.use("Agg", force=False)
            import matplotlib.pyplot as plt

            plt.imsave(path, img)
        except Exception:
            import numpy as np  # noqa: F811

            np.save(path[:-4] + ".npy", img)

    def log_feature_maps(self, step: int, music_feats, motion_feats) -> None:
        """The reference's per-eval encoder feature-map dump
        (`M2SNet_eval.py:110-116`): all music maps; motion maps subsampled to
        first/last/even indices."""
        for i, f in enumerate(music_feats):
            self.log_image(
                step, f"M2SNet Music feature/layer {i}", feature_map_image(f)
            )
        n = len(motion_feats)
        for i, f in enumerate(motion_feats):
            if i == 0 or i == n - 1 or i % 2 == 0:
                self.log_image(
                    step, f"M2SNet Motion feature/layer {i}", feature_map_image(f)
                )

    def log_motion_plot(self, step: int, fake_motion, real_motion, tag: str = "motion/traces") -> None:
        self.log_image(step, tag, motion_plot_image(fake_motion, real_motion))

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def feature_map_image(feat) -> "np.ndarray":
    """(B, T, C) or (T, C) feature map -> (C, T, 3) uint8 plasma heatmap
    (the reference's `plot_hidden_feature`, `train_utils.py:138-150`,
    without the savefig-to-disk round trip)."""
    import numpy as np

    f = np.asarray(feat, dtype=np.float32)
    if f.ndim == 3:
        f = f[0]
    f = f.T  # (C, T) like the reference's imshow orientation
    lo, hi = float(f.min()), float(f.max())
    f = (f - lo) / max(hi - lo, 1e-12)
    try:
        from matplotlib import cm

        rgba = cm.plasma(f)
        return (rgba[..., :3] * 255).astype(np.uint8)
    except Exception:  # matplotlib-free fallback: grayscale
        g = (f * 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)


def motion_plot_image(fake_motion, real_motion) -> "np.ndarray":
    """Real-vs-generated per-keypoint coordinate traces
    (`train_utils.py:104-135`): 13 joints x (x, y) subplots, real gray /
    fake red, rendered to an RGB array."""
    import numpy as np

    fake = np.asarray(fake_motion)
    real = np.asarray(real_motion)
    if fake.ndim == 4:
        fake = fake[0]
    if real.ndim == 4:
        real = real[0]

    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    J = fake.shape[1]
    fig, axes = plt.subplots(J, 2, figsize=(18, 6))
    for j in range(J):
        for xy in range(2):
            ax = axes[j][xy]
            ax.plot(real[:, j, xy], linewidth=0.5, color="gray")
            ax.plot(fake[:, j, xy], linewidth=0.5, color="r")
            ax.set_ylim(0, 1)
            ax.set_xticks([])
            ax.set_yticks([])
    fig.subplots_adjust(wspace=0, hspace=0, left=0.05, right=0.95, top=0.95, bottom=0.05)
    fig.canvas.draw()
    img = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return img
