"""T2M co-embedding evaluator networks (reference
`datasets/evaluator_models.py:79-438`, `datasets/evaluator.py:354-441`), as
flax modules.

The reference loads pretrained torch weights (`text_mot_match/finest.tar`);
`load_torch_checkpoint` converts that state_dict into the flax param tree so
published evaluator weights remain usable.  Length handling uses
`nn.RNN(seq_lengths=...)` instead of pack_padded_sequence — no sort-by-length
requirement, so unlike the reference ("results do not follow the order of
inputs", `evaluator.py:408`) embeddings stay input-ordered.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class MovementConvEncoder(nn.Module):
    """Two stride-2 Conv1d + linear head: pose frames -> movement latents at
    1/4 temporal rate (`evaluator_models.py:79-98`)."""

    hidden_size: int = 512
    output_size: int = 512
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for feat in (self.hidden_size, self.output_size):
            x = nn.Conv(feat, kernel_size=(4,), strides=(2,), padding=((1, 1),))(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
            x = _leaky(x)
        return nn.Dense(self.output_size)(x)


class _BiGRUCo(nn.Module):
    """Shared bidirectional-GRU trunk with learned initial hidden states and
    length-aware final carries."""

    hidden_size: int
    output_size: int

    @nn.compact
    def trunk(self, inputs: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        b = inputs.shape[0]
        h0 = self.param(
            "hidden", nn.initializers.normal(1.0), (2, self.hidden_size)
        )
        # nn.RNN is scope-transparent: params live under the *cell* names.
        fwd = nn.RNN(nn.GRUCell(self.hidden_size, name="cell_fwd"), return_carry=True)
        bwd = nn.RNN(
            nn.GRUCell(self.hidden_size, name="cell_bwd"), return_carry=True,
            reverse=True, keep_order=True,
        )
        init_f = jnp.broadcast_to(h0[0], (b, self.hidden_size))
        init_b = jnp.broadcast_to(h0[1], (b, self.hidden_size))
        carry_f, _ = fwd(inputs, initial_carry=init_f, seq_lengths=lengths)
        carry_b, _ = bwd(inputs, initial_carry=init_b, seq_lengths=lengths)
        last = jnp.concatenate([carry_f, carry_b], axis=-1)
        h = nn.Dense(self.hidden_size)(last)
        h = _leaky(nn.LayerNorm(epsilon=1e-5)(h))  # torch LayerNorm eps, for checkpoint parity
        return nn.Dense(self.output_size)(h)


class TextEncoderBiGRUCo(_BiGRUCo):
    """GloVe + POS one-hot -> sentence co-embedding
    (`evaluator_models.py:311-350`)."""

    hidden_size: int = 512
    output_size: int = 512

    @nn.compact
    def __call__(self, word_embs, pos_onehot, cap_lens) -> jnp.ndarray:
        pos_embs = nn.Dense(word_embs.shape[-1], name="pos_emb")(pos_onehot)
        inputs = nn.Dense(self.hidden_size, name="input_emb")(word_embs + pos_embs)
        return self.trunk(inputs, cap_lens)


class MotionEncoderBiGRUCo(_BiGRUCo):
    """Movement latents -> motion co-embedding
    (`evaluator_models.py:353-386`)."""

    hidden_size: int = 1024
    output_size: int = 512

    @nn.compact
    def __call__(self, movements, m_lens) -> jnp.ndarray:
        inputs = nn.Dense(self.hidden_size, name="input_emb")(movements)
        return self.trunk(inputs, m_lens)


class T2MEvaluatorWrapper:
    """`EvaluatorModelWrapper` equivalent (`evaluator.py:375-441`): strips the
    4 foot-contact channels, movement-encodes at unit_length=4, then
    co-embeds.  Raises for non-t2m/kit datasets exactly like the reference
    (`evaluator.py:281-293`) — ConductorMotion100 uses
    `eval.protocol.M2SNetCoEmbedding` instead."""

    UNIT_LENGTH = 4

    def __init__(self, dataset_name: str, variables: dict[str, Any] | None = None):
        if dataset_name == "t2m":
            self.dim_pose = 263
        elif dataset_name == "kit":
            self.dim_pose = 251
        else:
            raise KeyError(
                "Dataset not Recognized!!! (t2m/kit only; music uses "
                "M2SNetCoEmbedding)"
            )
        self.movement_enc = MovementConvEncoder()
        self.text_enc = TextEncoderBiGRUCo()
        self.motion_enc = MotionEncoderBiGRUCo()
        self.variables = variables  # {"movement": ..., "text": ..., "motion": ...}

    def init(self, rng, max_text_len: int = 20, max_motion_len: int = 196):
        import jax

        r1, r2, r3 = jax.random.split(rng, 3)
        motions = jnp.zeros((1, max_motion_len, self.dim_pose - 4))
        words = jnp.zeros((1, max_text_len, 300))
        pos = jnp.zeros((1, max_text_len, 15))
        self.variables = {
            "movement": self.movement_enc.init(r1, motions),
            "text": self.text_enc.init(r2, words, pos, jnp.array([max_text_len])),
            "motion": self.motion_enc.init(
                r3, jnp.zeros((1, max_motion_len // self.UNIT_LENGTH, 512)),
                jnp.array([max_motion_len // self.UNIT_LENGTH]),
            ),
        }
        return self.variables

    def get_motion_embeddings(self, motions, m_lens) -> np.ndarray:
        movements = self.movement_enc.apply(
            self.variables["movement"], jnp.asarray(motions)[..., :-4]
        )
        m_lens = jnp.asarray(m_lens) // self.UNIT_LENGTH
        return np.asarray(
            self.motion_enc.apply(self.variables["motion"], movements, m_lens)
        )

    def get_co_embeddings(self, word_embs, pos_ohot, cap_lens, motions, m_lens):
        text_emb = self.text_enc.apply(
            self.variables["text"], jnp.asarray(word_embs), jnp.asarray(pos_ohot),
            jnp.asarray(cap_lens),
        )
        return np.asarray(text_emb), self.get_motion_embeddings(motions, m_lens)


def load_torch_checkpoint(path: str) -> dict[str, Any]:
    """Convert the reference's pretrained `finest.tar` torch state_dicts into
    the flax variable trees this module expects (`evaluator.py:367-372`)."""
    import torch

    ckpt = torch.load(path, map_location="cpu")

    def t(x):
        return np.asarray(x.detach().cpu().numpy())

    def conv_k(x):  # torch Conv1d (out, in, k) -> flax (k, in, out)
        return t(x).transpose(2, 1, 0)

    def gru_params(sd, prefix):
        """torch GRU gate order is (r, z, n); flax GRUCell keeps separate
        r/z/n Dense kernels (transposed, hidden-split)."""
        w_ih = t(sd[f"{prefix}.weight_ih_l0"])  # (3H, in)
        w_hh = t(sd[f"{prefix}.weight_hh_l0"])
        b_ih = t(sd[f"{prefix}.bias_ih_l0"])
        b_hh = t(sd[f"{prefix}.bias_hh_l0"])
        h = w_hh.shape[1]
        ir, iz, in_ = (w_ih[i * h : (i + 1) * h].T for i in range(3))
        hr, hz, hn = (w_hh[i * h : (i + 1) * h].T for i in range(3))
        bir, biz, bin_ = (b_ih[i * h : (i + 1) * h] for i in range(3))
        bhr, bhz, bhn = (b_hh[i * h : (i + 1) * h] for i in range(3))
        return {
            "ir": {"kernel": ir, "bias": bir},
            "iz": {"kernel": iz, "bias": biz},
            "in": {"kernel": in_, "bias": bin_},
            "hr": {"kernel": hr},
            "hz": {"kernel": hz},
            "hn": {"kernel": hn, "bias": bhn},
            # flax GRUCell has no separate bhr/bhz; torch adds them inside the
            # sigmoid — fold into the input-side biases (mathematically equal).
            "_fold": {"bhr": bhr, "bhz": bhz},
        }

    def fold(g):
        g = dict(g)
        extra = g.pop("_fold")
        g["ir"] = {"kernel": g["ir"]["kernel"], "bias": g["ir"]["bias"] + extra["bhr"]}
        g["iz"] = {"kernel": g["iz"]["kernel"], "bias": g["iz"]["bias"] + extra["bhz"]}
        return g

    def bigru_tree(sd, input_emb_key, extra=None):
        params = {
            "input_emb": {
                "kernel": t(sd[f"{input_emb_key}.weight"]).T,
                "bias": t(sd[f"{input_emb_key}.bias"]),
            },
            "hidden": t(sd["hidden"])[:, 0, :],
            "cell_fwd": fold(gru_params(sd, "gru")),
            "cell_bwd": fold(
                gru_params(sd, "gru")
                if "gru.weight_ih_l0_reverse" not in sd
                else _rev(sd)
            ),
            "Dense_0": {
                "kernel": t(sd["output_net.0.weight"]).T,
                "bias": t(sd["output_net.0.bias"]),
            },
            "LayerNorm_0": {
                "scale": t(sd["output_net.1.weight"]),
                "bias": t(sd["output_net.1.bias"]),
            },
            "Dense_1": {
                "kernel": t(sd["output_net.3.weight"]).T,
                "bias": t(sd["output_net.3.bias"]),
            },
        }
        if extra:
            params.update(extra)
        return {"params": params}

    def _rev(sd):
        rsd = {
            "gru.weight_ih_l0": sd["gru.weight_ih_l0_reverse"],
            "gru.weight_hh_l0": sd["gru.weight_hh_l0_reverse"],
            "gru.bias_ih_l0": sd["gru.bias_ih_l0_reverse"],
            "gru.bias_hh_l0": sd["gru.bias_hh_l0_reverse"],
        }
        return gru_params(rsd, "gru")

    move_sd = ckpt["movement_encoder"]
    movement = {
        "params": {
            "Conv_0": {"kernel": conv_k(move_sd["main.0.weight"]), "bias": t(move_sd["main.0.bias"])},
            "Conv_1": {"kernel": conv_k(move_sd["main.3.weight"]), "bias": t(move_sd["main.3.bias"])},
            "Dense_0": {"kernel": t(move_sd["out_net.weight"]).T, "bias": t(move_sd["out_net.bias"])},
        }
    }
    text_sd = ckpt["text_encoder"]
    text = bigru_tree(
        text_sd, "input_emb",
        extra={"pos_emb": {"kernel": t(text_sd["pos_emb.weight"]).T, "bias": t(text_sd["pos_emb.bias"])}},
    )
    motion = bigru_tree(ckpt["motion_encoder"], "input_emb")
    return {"movement": movement, "text": text, "motion": motion}
