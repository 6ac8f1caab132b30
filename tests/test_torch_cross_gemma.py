"""Cross-framework parity for the from-scratch JAX Gemma-3 text model.

HuggingFace ``transformers``' Gemma3TextModel is the canonical PyTorch
implementation of the architecture the reference wraps via mlx_vlm
(reference: mlx_video/models/ltx/text_encoder.py:47-267). Shared random
weights are ported into the JAX param pytree and all hidden states are
compared — including sequence lengths LONGER than the sliding window, which
exercises the true local masks on the alternating local/global layer
schedule (the one place this implementation deliberately improves on the
reference's full-mask shortcut, models/gemma3.py:22-26; HF agrees with us,
not with the shortcut).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from mlx_video_tpu.models.gemma3 import (
    Gemma3TextConfig,
    gemma3_hidden_states,
    gemma3_logits,
)

CFG = dict(
    vocab_size=257,
    hidden_size=64,
    num_hidden_layers=7,  # pattern 6 -> layer 5 is global, the rest sliding
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    intermediate_size=128,
    rope_theta=1_000_000.0,
    rope_local_base_freq=10_000.0,
    sliding_window=4,  # < seq_len below: the true local mask matters
    sliding_window_pattern=6,
    query_pre_attn_scalar=16.0,
)


def _hf_model():
    from transformers import Gemma3TextConfig as HFConfig
    from transformers import Gemma3TextModel

    hf_cfg = HFConfig(
        vocab_size=CFG["vocab_size"],
        hidden_size=CFG["hidden_size"],
        num_hidden_layers=CFG["num_hidden_layers"],
        num_attention_heads=CFG["num_attention_heads"],
        num_key_value_heads=CFG["num_key_value_heads"],
        head_dim=CFG["head_dim"],
        intermediate_size=CFG["intermediate_size"],
        rope_theta=CFG["rope_theta"],
        rope_local_base_freq=CFG["rope_local_base_freq"],
        sliding_window=CFG["sliding_window"],
        sliding_window_pattern=CFG["sliding_window_pattern"],
        query_pre_attn_scalar=CFG["query_pre_attn_scalar"],
        hidden_activation="gelu_pytorch_tanh",
        attn_implementation="eager",
        use_cache=False,
    )
    torch.manual_seed(0)
    model = Gemma3TextModel(hf_cfg).eval().to(torch.float32)
    return model


def _port_params(model) -> dict:
    """HF state dict -> the JAX param pytree (linears transpose to (in, out),
    per-layer tensors stack on a leading layer axis)."""
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    n = CFG["num_hidden_layers"]

    def lin(name, i):
        return {"weight": jnp.asarray(sd[f"layers.{i}.{name}.weight"].T)}

    def norm(name, i):
        return {"weight": jnp.asarray(sd[f"layers.{i}.{name}.weight"])}

    layers = []
    for i in range(n):
        layers.append(
            {
                "input_layernorm": norm("input_layernorm", i),
                "post_attention_layernorm": norm("post_attention_layernorm", i),
                "pre_feedforward_layernorm": norm("pre_feedforward_layernorm", i),
                "post_feedforward_layernorm": norm("post_feedforward_layernorm", i),
                "self_attn": {
                    "q_proj": lin("self_attn.q_proj", i),
                    "k_proj": lin("self_attn.k_proj", i),
                    "v_proj": lin("self_attn.v_proj", i),
                    "o_proj": lin("self_attn.o_proj", i),
                    "q_norm": norm("self_attn.q_norm", i),
                    "k_norm": norm("self_attn.k_norm", i),
                },
                "mlp": {
                    "gate_proj": lin("mlp.gate_proj", i),
                    "up_proj": lin("mlp.up_proj", i),
                    "down_proj": lin("mlp.down_proj", i),
                },
            }
        )
    return {
        "embed_tokens": {"weight": jnp.asarray(sd["embed_tokens.weight"])},
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs, 0), *layers),
        "norm": {"weight": jnp.asarray(sd["norm.weight"])},
    }


class TestTorchCrossGemma3:
    def test_hidden_states_match_hf(self):
        model = _hf_model()
        params = _port_params(model)
        cfg = Gemma3TextConfig(**{k: v for k, v in CFG.items()})

        rng = np.random.default_rng(0)
        b, t = 2, 12  # t > sliding_window: local layers differ from full
        ids = rng.integers(1, CFG["vocab_size"], size=(b, t))
        # ragged padding on sample 1
        mask = np.ones((b, t), np.int64)
        mask[1, 9:] = 0

        with torch.no_grad():
            hf = model(
                input_ids=torch.tensor(ids),
                attention_mask=torch.tensor(mask),
                output_hidden_states=True,
            )
        ours = gemma3_hidden_states(
            params, cfg, jnp.asarray(ids), attention_mask=jnp.asarray(mask)
        )
        assert len(ours) == CFG["num_hidden_layers"] + 1

        # [scaled embeddings] + layer outputs 0..n-2 vs HF hidden_states
        for i in range(CFG["num_hidden_layers"]):
            a = np.asarray(ours[i], np.float32)
            bb = hf.hidden_states[i].numpy()
            # padded positions carry garbage on both sides; compare valid only
            np.testing.assert_allclose(
                a[0], bb[0], rtol=2e-4, atol=2e-4, err_msg=f"state {i} (sample 0)"
            )
            np.testing.assert_allclose(
                a[1, :9], bb[1, :9], rtol=2e-4, atol=2e-4, err_msg=f"state {i} (sample 1)"
            )
        # final entry: norm(h_final) == HF last_hidden_state
        np.testing.assert_allclose(
            np.asarray(ours[-1], np.float32)[0],
            hf.last_hidden_state.numpy()[0],
            rtol=2e-4, atol=2e-4,
        )

    def test_logits_match_hf_causal_lm(self):
        from transformers import Gemma3ForCausalLM

        model = _hf_model()
        cfg_hf = model.config
        cfg_hf.tie_word_embeddings = True
        lm = Gemma3ForCausalLM(cfg_hf).eval().to(torch.float32)
        # share the text model weights; head ties to embeddings
        lm.model.load_state_dict(model.state_dict())
        lm.tie_weights()
        params = _port_params(model)
        cfg = Gemma3TextConfig(**{k: v for k, v in CFG.items()})

        rng = np.random.default_rng(1)
        ids = rng.integers(1, CFG["vocab_size"], size=(1, 10))
        with torch.no_grad():
            hf_logits = lm(input_ids=torch.tensor(ids)).logits.numpy()
        ours, _ = gemma3_logits(params, cfg, jnp.asarray(ids))
        np.testing.assert_allclose(
            np.asarray(ours, np.float32), hf_logits, rtol=3e-4, atol=3e-4
        )

    def test_kv_cached_decode_matches_hf(self):
        """The KV-cached decode path (prompt-enhancement backend,
        models/gemma3.py generate): prefill + 4 greedy steps produce the
        same logits as HF with use_cache=True at every step."""
        from transformers import Gemma3ForCausalLM

        from mlx_video_tpu.models.gemma3 import init_kv_caches

        model = _hf_model()
        cfg_hf = model.config
        cfg_hf.tie_word_embeddings = True
        cfg_hf.use_cache = True
        lm = Gemma3ForCausalLM(cfg_hf).eval().to(torch.float32)
        lm.model.load_state_dict(model.state_dict())
        lm.tie_weights()
        params = _port_params(model)
        cfg = Gemma3TextConfig(**{k: v for k, v in CFG.items()})

        rng = np.random.default_rng(2)
        prompt_len, steps = 8, 4
        ids = rng.integers(1, CFG["vocab_size"], size=(1, prompt_len))
        max_len = prompt_len + steps

        # ours: prefill with padded-fixed-length caches, then greedy steps
        caches = init_kv_caches(cfg, 1, max_len, dtype=jnp.float32)
        mask = np.zeros((1, max_len), np.int32)
        mask[:, :prompt_len] = 1
        logits, caches = gemma3_logits(
            params, cfg, jnp.asarray(ids), jnp.asarray(mask), caches, position_offset=0
        )
        # HF: prefill with cache
        with torch.no_grad():
            hf_out = lm(input_ids=torch.tensor(ids), use_cache=True)
        np.testing.assert_allclose(
            np.asarray(logits[:, -1], np.float32),
            hf_out.logits[:, -1].numpy(), rtol=3e-4, atol=3e-4,
        )

        past = hf_out.past_key_values
        pos = prompt_len
        next_tok = int(np.argmax(np.asarray(logits[:, -1])[0]))
        for step in range(steps - 1):
            mask[:, pos] = 1
            logits, caches = gemma3_logits(
                params, cfg, jnp.asarray([[next_tok]]), jnp.asarray(mask),
                caches, position_offset=pos,
            )
            with torch.no_grad():
                hf_step = lm(
                    input_ids=torch.tensor([[next_tok]]),
                    past_key_values=past, use_cache=True,
                )
            past = hf_step.past_key_values
            np.testing.assert_allclose(
                np.asarray(logits[:, -1], np.float32),
                hf_step.logits[:, -1].numpy(), rtol=3e-4, atol=3e-4,
                err_msg=f"decode step {step}",
            )
            pos += 1
            next_tok = int(np.argmax(np.asarray(logits[:, -1])[0]))
