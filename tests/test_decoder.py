"""Causal LM tests: HF checkpoint parity, KV-cache decode consistency.

The parity test builds a tiny synthetic GPT-2 checkpoint (config.json +
model.safetensors with HF's exact naming/layout), loads it through
``load_hf_decoder_params``, and compares logits against an independent numpy
GPT-2 implementation written here — so the loader's weight mapping and the
decoder's forward are both checked against the architecture spec rather than
against themselves.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semcode_tpu.models.decoder import (
    CodeDecoderLM,
    DecoderConfig,
    forward_logits,
    generate_tokens,
    init_params,
    load_hf_decoder_params,
)
from semcode_tpu.models.tokenizer import ByteTokenizer

VOCAB, HIDDEN, LAYERS, HEADS, MAXLEN = 97, 32, 2, 2, 64


def _synthetic_hf_checkpoint(tmp_path, rng):
    """Write a tiny GPT-2 checkpoint in HF's on-disk format."""
    cfg = {
        "model_type": "gpt2",
        "vocab_size": VOCAB,
        "n_embd": HIDDEN,
        "n_layer": LAYERS,
        "n_head": HEADS,
        "n_positions": MAXLEN,
        "n_inner": None,
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg))

    def w(*shape):
        return rng.normal(0.0, 0.1, size=shape).astype(np.float32)

    raw = {
        "transformer.wte.weight": w(VOCAB, HIDDEN),
        "transformer.wpe.weight": w(MAXLEN, HIDDEN),
        "transformer.ln_f.weight": 1.0 + 0.1 * w(HIDDEN),
        "transformer.ln_f.bias": 0.1 * w(HIDDEN),
    }
    for i in range(LAYERS):
        p = f"transformer.h.{i}."
        raw[p + "ln_1.weight"] = 1.0 + 0.1 * w(HIDDEN)
        raw[p + "ln_1.bias"] = 0.1 * w(HIDDEN)
        raw[p + "attn.c_attn.weight"] = w(HIDDEN, 3 * HIDDEN)  # Conv1D (in, out)
        raw[p + "attn.c_attn.bias"] = 0.1 * w(3 * HIDDEN)
        raw[p + "attn.c_proj.weight"] = w(HIDDEN, HIDDEN)
        raw[p + "attn.c_proj.bias"] = 0.1 * w(HIDDEN)
        raw[p + "ln_2.weight"] = 1.0 + 0.1 * w(HIDDEN)
        raw[p + "ln_2.bias"] = 0.1 * w(HIDDEN)
        raw[p + "mlp.c_fc.weight"] = w(HIDDEN, 4 * HIDDEN)
        raw[p + "mlp.c_fc.bias"] = 0.1 * w(4 * HIDDEN)
        raw[p + "mlp.c_proj.weight"] = w(4 * HIDDEN, HIDDEN)
        raw[p + "mlp.c_proj.bias"] = 0.1 * w(HIDDEN)
    from safetensors.numpy import save_file

    save_file(raw, str(tmp_path / "model.safetensors"))
    return {k.removeprefix("transformer."): v for k, v in raw.items()}


# --- independent numpy GPT-2 (the architecture spec, written from scratch) --


def _np_ln(x, g, b):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + 1e-5) * g + b


def _np_gelu(x):
    return 0.5 * x * (1.0 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x**3)))


def _np_gpt2_logits(raw, ids):
    T = ids.shape[1]
    x = raw["wte.weight"][ids] + raw["wpe.weight"][None, :T]
    hd = HIDDEN // HEADS
    causal = np.tril(np.ones((T, T), bool))
    for i in range(LAYERS):
        p = f"h.{i}."
        h = _np_ln(x, raw[p + "ln_1.weight"], raw[p + "ln_1.bias"])
        qkv = h @ raw[p + "attn.c_attn.weight"] + raw[p + "attn.c_attn.bias"]
        q, k, v = np.split(qkv, 3, axis=-1)
        q = q.reshape(*q.shape[:2], HEADS, hd)
        k = k.reshape(*k.shape[:2], HEADS, hd)
        v = v.reshape(*v.shape[:2], HEADS, hd)
        scores = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        scores = np.where(causal[None, None], scores, -1e30)
        probs = np.exp(scores - scores.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        out = np.einsum("bhqk,bkhd->bqhd", probs, v).reshape(x.shape)
        x = x + out @ raw[p + "attn.c_proj.weight"] + raw[p + "attn.c_proj.bias"]
        h = _np_ln(x, raw[p + "ln_2.weight"], raw[p + "ln_2.bias"])
        h = _np_gelu(h @ raw[p + "mlp.c_fc.weight"] + raw[p + "mlp.c_fc.bias"])
        x = x + h @ raw[p + "mlp.c_proj.weight"] + raw[p + "mlp.c_proj.bias"]
    x = _np_ln(x, raw["ln_f.weight"], raw["ln_f.bias"])
    return x @ raw["wte.weight"].T


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("gpt2-tiny")
    raw = _synthetic_hf_checkpoint(tmp, np.random.default_rng(3))
    return tmp, raw


def test_hf_loader_logits_match_numpy_reference(checkpoint):
    tmp, raw = checkpoint
    params, cfg = load_hf_decoder_params(tmp, dtype=jnp.float32)
    assert cfg.vocab_size == VOCAB and cfg.layers == LAYERS
    rng = np.random.default_rng(5)
    ids = rng.integers(0, VOCAB, size=(2, 12)).astype(np.int32)
    mask = np.ones_like(ids)
    got = np.asarray(forward_logits(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    want = _np_gpt2_logits(raw, ids)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_kv_cache_decode_matches_teacher_forced_rollout(checkpoint):
    tmp, _ = checkpoint
    params, cfg = load_hf_decoder_params(tmp, dtype=jnp.float32)
    rng = np.random.default_rng(11)
    prompt = rng.integers(0, VOCAB, size=5).tolist()
    max_new = 6

    # scanned KV-cache decode on a right-padded prompt bucket
    P = 8
    ids = np.zeros((1, P), dtype=np.int32)
    msk = np.zeros((1, P), dtype=np.int32)
    ids[0, :5] = prompt
    msk[0, :5] = 1
    got = np.asarray(
        generate_tokens(
            params, cfg, jnp.asarray(ids), jnp.asarray(msk),
            jax.random.PRNGKey(0), max_new=max_new, greedy=True,
        )
    )[0].tolist()

    # reference: re-run the full teacher-forced forward each step
    seq = list(prompt)
    want = []
    for _ in range(max_new):
        a = np.asarray([seq], dtype=np.int32)
        m = np.ones_like(a)
        logits = np.asarray(
            forward_logits(params, cfg, jnp.asarray(a), jnp.asarray(m))
        )
        nxt = int(np.argmax(logits[0, -1]))
        want.append(nxt)
        seq.append(nxt)
    assert got == want


def test_generate_is_deterministic_when_greedy(checkpoint):
    tmp, _ = checkpoint
    params, cfg = load_hf_decoder_params(tmp, dtype=jnp.float32)
    ids = jnp.asarray([[3, 7, 11, 0, 0, 0, 0, 0]], dtype=jnp.int32)
    msk = jnp.asarray([[1, 1, 1, 0, 0, 0, 0, 0]], dtype=jnp.int32)
    a = generate_tokens(params, cfg, ids, msk, jax.random.PRNGKey(1), max_new=4)
    b = generate_tokens(params, cfg, ids, msk, jax.random.PRNGKey(2), max_new=4)
    assert np.asarray(a).tolist() == np.asarray(b).tolist()


def test_byte_tokenizer_roundtrip_and_eos():
    tok = ByteTokenizer()
    text = "def f(x):\n    return x  # ünïcode"
    assert tok.decode(tok.encode(text)) == text
    ids = tok.encode("abc") + [ByteTokenizer.EOS_ID] + tok.encode("junk")
    assert tok.decode(ids) == "abc"


def test_code_decoder_lm_generates_text_from_scratch():
    cfg = DecoderConfig(vocab_size=258, hidden=32, layers=2, heads=2,
                        mlp_dim=128, max_len=256, dtype=jnp.float32)
    lm = CodeDecoderLM.__new__(CodeDecoderLM)
    lm.tokenizer = ByteTokenizer(max_len=256)
    lm.cfg = cfg
    lm.params = init_params(cfg, seed=0)
    lm.random_init = True
    out = lm.generate("what does the ivf index do?", max_new_tokens=8)
    assert isinstance(out, str)


def test_tpu_local_chat_provider_wiring():
    from semcode_tpu.rag.llm import create_llm
    from semcode_tpu.settings import AppSettings

    cfg = AppSettings(rag_provider="fallback")
    assert create_llm(cfg) is None
    cfg = AppSettings(rag_provider="nope")
    with pytest.raises(NotImplementedError):
        create_llm(cfg)


def test_generate_clamps_oversized_max_new_tokens():
    """rag_max_new_tokens >= max_len flows raw from settings: the prompt
    budget must stay positive (zero/negative-width prompt arrays crash)."""
    cfg = DecoderConfig(vocab_size=258, hidden=32, layers=2, heads=2,
                        mlp_dim=128, max_len=64, dtype=jnp.float32)
    lm = CodeDecoderLM.__new__(CodeDecoderLM)
    lm.tokenizer = ByteTokenizer(max_len=64)
    lm.cfg = cfg
    lm.params = init_params(cfg, seed=0)
    lm.random_init = True
    for bad in (64, 100, 0, -5):
        out = lm.generate("some question", max_new_tokens=bad)
        assert isinstance(out, str)
