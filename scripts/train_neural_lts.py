#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Train the neural letter-to-sound transformer on the shipped lexicon.

Reads  frontend/g2p/data/en_core.tsv + en_derived.tsv
Writes frontend/g2p/data/neural_lts.npz  (fp16 weights + config JSON)

The model is a small pre-LN transformer encoder-decoder over characters ->
IPA phoneme symbols (stress marks as separate tokens). It is defined here
in PURE JAX with an explicit param dict whose keys are exactly the npz
keys consumed by frontend/g2p/neural_lts.py — the numpy serving forward is
a 1:1 mirror (tests/test_neural_lts.py asserts jax==numpy on live words).

Dev protocol (leakage-controlled): hold out 1/24 of CORE roots, and
exclude every derived form of a held-out root from training (otherwise
"hope" in dev trains on "hoping" and dev accuracy lies). Dev metric is
exact-match word accuracy on those core roots. The reference gold lexicon
is NOT touched here — training data is the package's own authored lexicon
only (gold stays a test-time oracle, per the round-3 verdict rule).

Run after lexicon changes (follows scripts/build_en_lexicon.py):
  python scripts/train_neural_lts.py [--epochs 30] [--d 256]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from illufly_tts_tpu.frontend.g2p.lts_model import split_phonemes  # noqa: E402

DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "illufly_tts_tpu", "frontend", "g2p", "data",
)

PAD, BOS, EOS = 0, 1, 2
IN_VOCAB = list("abcdefghijklmnopqrstuvwxyz'")
MAX_IN = 24
MAX_OUT = 28
SEED = 20260820


def out_tokens(ipa: str):
    """IPA -> symbol tokens with stress marks standalone."""
    toks = []
    for t in split_phonemes(ipa):
        if t and t[0] in "ˈˌ":
            toks.append(t[0])
            toks.append(t[1:])
        else:
            toks.append(t)
    return toks


def load_lexicon(path, table):
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            word, _, ipa = line.partition("\t")
            w = word.lower()
            if ipa and len(w) > 2 and \
                    all(c in "abcdefghijklmnopqrstuvwxyz'" for c in w):
                table[w] = ipa


def build_dataset(rng: np.random.Generator):
    core, derived = {}, {}
    load_lexicon(os.path.join(DATA, "en_core.tsv"), core)
    load_lexicon(os.path.join(DATA, "en_derived.tsv"), derived)

    # derived roots: regenerate the root->forms map the same way the
    # builder does, so held-out roots take their inflections with them
    from scripts.build_en_lexicon import derive

    form_root = {}
    for w, ipa in core.items():
        for form in derive(w, ipa):
            form_root[form] = w

    roots = sorted(core)
    rng.shuffle(roots)
    n_dev = max(400, len(roots) // 24)
    dev_roots = set(roots[:n_dev])

    def ok_len(w, ipa):
        return len(w) <= MAX_IN and len(out_tokens(ipa)) <= MAX_OUT - 1

    train, dev = [], []
    for w, ipa in core.items():
        if not ok_len(w, ipa):
            continue
        (dev if w in dev_roots else train).append((w, ipa))
    for w, ipa in derived.items():
        if w in core or not ok_len(w, ipa):
            continue
        if form_root.get(w) in dev_roots:
            continue
        train.append((w, ipa))

    # out vocab from the data
    syms = set()
    for _, ipa in train + dev:
        syms.update(out_tokens(ipa))
    out_vocab = ["<pad>", "<s>", "</s>"] + sorted(syms)
    return train, dev, out_vocab


def encode_batch(pairs, out_sym):
    """-> (src [N,MAX_IN], tgt_in [N,MAX_OUT], tgt_out [N,MAX_OUT])"""
    in_map = {c: i + 3 for i, c in enumerate(IN_VOCAB)}
    N = len(pairs)
    src = np.zeros((N, MAX_IN), dtype=np.int32)
    tin = np.zeros((N, MAX_OUT), dtype=np.int32)
    tout = np.zeros((N, MAX_OUT), dtype=np.int32)
    for i, (w, ipa) in enumerate(pairs):
        ws = [in_map[c] for c in w]
        src[i, :len(ws)] = ws
        ts = [out_sym[t] for t in out_tokens(ipa)]
        tin[i, 0] = BOS
        tin[i, 1:len(ts) + 1] = ts
        tout[i, :len(ts)] = ts
        tout[i, len(ts)] = EOS
    return src, tin, tout


# ---- model (pure jax, explicit param dict) ----------------------------------

def init_params(key, cfg):
    import jax

    d, ffn = cfg["d_model"], cfg["ffn"]
    Vin = len(cfg["in_vocab"]) + 3
    Vout = len(cfg["out_vocab"])
    params = {}

    def glorot(key, shape):
        fan_in, fan_out = shape[-2], shape[-1]
        s = math.sqrt(2.0 / (fan_in + fan_out))
        return jax.random.normal(key, shape, dtype=np.float32) * s

    keys = iter(jax.random.split(key, 400))

    def dense(prefix, din, dout):
        params[f"{prefix}/w"] = glorot(next(keys), (din, dout))
        params[f"{prefix}/b"] = np.zeros((dout,), np.float32)

    def ln(prefix):
        params[f"{prefix}/g"] = np.ones((d,), np.float32)
        params[f"{prefix}/b"] = np.zeros((d,), np.float32)

    def attn(prefix):
        for nm in ("q", "k", "v", "o"):
            dense(f"{prefix}/{nm}", d, d)

    params["enc/emb"] = glorot(next(keys), (Vin, d))
    params["enc/pos"] = glorot(next(keys), (MAX_IN, d)) * 0.1
    for i in range(cfg["enc_layers"]):
        p = f"enc/l{i}"
        attn(f"{p}/attn")
        dense(f"{p}/ffn/fc1", d, ffn)
        dense(f"{p}/ffn/fc2", ffn, d)
        ln(f"{p}/ln1")
        ln(f"{p}/ln2")
    ln("enc/lnf")
    params["dec/emb"] = glorot(next(keys), (Vout, d))
    params["dec/pos"] = glorot(next(keys), (MAX_OUT, d)) * 0.1
    for i in range(cfg["dec_layers"]):
        p = f"dec/l{i}"
        attn(f"{p}/self")
        attn(f"{p}/cross")
        dense(f"{p}/ffn/fc1", d, ffn)
        dense(f"{p}/ffn/fc2", ffn, d)
        ln(f"{p}/ln1")
        ln(f"{p}/ln2")
        ln(f"{p}/ln3")
    ln("dec/lnf")
    params["dec/out_b"] = np.zeros((Vout,), np.float32)
    return params


def forward(params, cfg, src, tgt_in, train_mode, dropout_key=None):
    """Mirrors neural_lts.NeuralLTS.{encode,decode_logits} exactly."""
    import jax
    import jax.numpy as jnp

    d, h = cfg["d_model"], cfg["n_heads"]
    dh = d // h
    drop = cfg["dropout"] if train_mode else 0.0
    keys = iter(jax.random.split(dropout_key, 200)) if train_mode \
        else iter([])

    def dropout(x):
        if drop <= 0.0:
            return x
        k = next(keys)
        keep = jax.random.bernoulli(k, 1.0 - drop, x.shape)
        return jnp.where(keep, x / (1.0 - drop), 0.0)

    def lnorm(prefix, x):
        m = x.mean(-1, keepdims=True)
        v = x.var(-1, keepdims=True)
        return (x - m) / jnp.sqrt(v + 1e-6) * params[f"{prefix}/g"] \
            + params[f"{prefix}/b"]

    def mha(prefix, q_in, kv_in, mask):
        B, Tq, _ = q_in.shape
        Tk = kv_in.shape[1]
        q = q_in @ params[f"{prefix}/q/w"] + params[f"{prefix}/q/b"]
        k = kv_in @ params[f"{prefix}/k/w"] + params[f"{prefix}/k/b"]
        v = kv_in @ params[f"{prefix}/v/w"] + params[f"{prefix}/v/b"]
        q = q.reshape(B, Tq, h, dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, Tk, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, Tk, h, dh).transpose(0, 2, 1, 3)
        att = q @ k.transpose(0, 1, 3, 2) / math.sqrt(dh)
        if mask is not None:
            att = att + mask
        att = jax.nn.softmax(att, axis=-1)
        att = dropout(att)
        out = (att @ v).transpose(0, 2, 1, 3).reshape(B, Tq, d)
        return out @ params[f"{prefix}/o/w"] + params[f"{prefix}/o/b"]

    def ffn(prefix, x):
        y = jax.nn.gelu(
            x @ params[f"{prefix}/fc1/w"] + params[f"{prefix}/fc1/b"],
            approximate=True,
        )
        y = dropout(y)
        return y @ params[f"{prefix}/fc2/w"] + params[f"{prefix}/fc2/b"]

    B, Tin = src.shape
    x = params["enc/emb"][src] + params["enc/pos"][:Tin][None]
    x = dropout(x)
    src_pad = jnp.where(src == PAD, -1e9, 0.0)[:, None, None, :]
    for i in range(cfg["enc_layers"]):
        p = f"enc/l{i}"
        y = lnorm(f"{p}/ln1", x)
        x = x + dropout(mha(f"{p}/attn", y, y, src_pad))
        x = x + dropout(ffn(f"{p}/ffn", lnorm(f"{p}/ln2", x)))
    memory = lnorm("enc/lnf", x)

    Tout = tgt_in.shape[1]
    x = params["dec/emb"][tgt_in] + params["dec/pos"][:Tout][None]
    x = dropout(x)
    causal = jnp.triu(jnp.full((Tout, Tout), -1e9), 1)
    for i in range(cfg["dec_layers"]):
        p = f"dec/l{i}"
        y = lnorm(f"{p}/ln1", x)
        x = x + dropout(mha(f"{p}/self", y, y, causal))
        x = x + dropout(
            mha(f"{p}/cross", lnorm(f"{p}/ln2", x), memory, src_pad)
        )
        x = x + dropout(ffn(f"{p}/ffn", lnorm(f"{p}/ln3", x)))
    x = lnorm("dec/lnf", x)
    return x @ params["dec/emb"].T * cfg.get("logit_scale", 1.0) \
        + params["dec/out_b"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--ffn", type=int, default=1024)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--enc-layers", type=int, default=3)
    ap.add_argument("--dec-layers", type=int, default=3)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--dropout", type=float, default=0.20)
    ap.add_argument("--label-smooth", type=float, default=0.1)
    ap.add_argument("--core-dup", type=int, default=3,
                    help="duplicate core entries this many times per epoch "
                         "(derived inflections otherwise dominate 4:1)")
    ap.add_argument("--avg-tail", type=int, default=8,
                    help="average the last N epochs' weights and keep the "
                         "better of (tail-average, best-single) on dev")
    ap.add_argument("--out", default=os.path.join(DATA, "neural_lts.npz"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    rng = np.random.default_rng(SEED)
    train, dev, out_vocab = build_dataset(rng)
    out_sym = {s: i for i, s in enumerate(out_vocab)}
    core_set = {}
    load_lexicon(os.path.join(DATA, "en_core.tsv"), core_set)
    train_core = [p for p in train if p[0] in core_set]
    print(f"train {len(train)} (core {len(train_core)}) dev {len(dev)} "
          f"out-vocab {len(out_vocab)}  devices {jax.devices()}")

    cfg = {
        "d_model": args.d, "ffn": args.ffn, "n_heads": args.heads,
        "enc_layers": args.enc_layers, "dec_layers": args.dec_layers,
        "dropout": args.dropout, "logit_scale": 1.0,
        "in_vocab": IN_VOCAB, "out_vocab": out_vocab,
        "max_in": MAX_IN, "max_out": MAX_OUT,
    }
    key = jax.random.PRNGKey(SEED)
    params = init_params(key, cfg)
    params = jax.tree.map(jnp.asarray, params)
    n_params = sum(int(np.prod(v.shape)) for v in params.values())
    print(f"params: {n_params / 1e6:.2f}M")

    # input pipeline: epoch = shuffled(train + core x (dup-1))
    epoch_pairs = train + train_core * (args.core_dup - 1)
    steps_per_epoch = len(epoch_pairs) // args.batch
    total_steps = steps_per_epoch * args.epochs
    warmup = min(500, max(1, total_steps // 10))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup, total_steps, end_value=args.lr * 0.02
    )
    opt = optax.adamw(sched, weight_decay=1e-4)
    opt_state = opt.init(params)

    Vout = len(out_vocab)
    ls = args.label_smooth

    def loss_fn(params, src, tin, tout, dkey):
        logits = forward(params, cfg, src, tin, True, dkey)
        mask = (tout != PAD).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        onehot = jax.nn.one_hot(tout, Vout)
        soft = onehot * (1 - ls) + ls / Vout
        ce = -(soft * logp).sum(-1)
        return (ce * mask).sum() / mask.sum()

    # the whole dataset lives on device; an epoch is ONE dispatch
    # (lax.scan over per-step index rows) — per-step host round trips over
    # the TPU tunnel would otherwise dominate wall clock by ~100x
    src_all, tin_all, tout_all = encode_batch(epoch_pairs, out_sym)
    src_all, tin_all, tout_all = (
        jnp.asarray(src_all), jnp.asarray(tin_all), jnp.asarray(tout_all)
    )

    @jax.jit
    def run_epoch(params, opt_state, perm, base_key):
        """perm: [steps, batch] int32 indices into the resident dataset."""

        def one_step(carry, inp):
            params, opt_state = carry
            idx, i = inp
            dkey = jax.random.fold_in(base_key, i)
            loss, grads = jax.value_and_grad(loss_fn)(
                params,
                jnp.take(src_all, idx, axis=0),
                jnp.take(tin_all, idx, axis=0),
                jnp.take(tout_all, idx, axis=0),
                dkey,
            )
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state),
            (perm, jnp.arange(perm.shape[0], dtype=jnp.int32)),
        )
        return params, opt_state, losses.mean()

    dev_src, _, dev_tout = encode_batch(dev, out_sym)
    dev_src = jnp.asarray(dev_src)
    dev_ref = jnp.asarray(np.where(dev_tout == EOS, PAD, dev_tout))

    @jax.jit
    def dev_accuracy(params):
        """Greedy decode on the dev set (one dispatch), exact-match word
        accuracy."""
        N = dev_src.shape[0]

        def one_t(carry, t):
            toks, alive = carry
            logits = forward(params, cfg, dev_src, toks, False)
            lg = jax.lax.dynamic_index_in_dim(logits, t, axis=1,
                                              keepdims=False)
            lg = lg.at[:, PAD].set(-1e9).at[:, BOS].set(-1e9)
            nxt = jnp.where(alive, lg.argmax(-1), PAD)
            out_t = jnp.where(nxt == EOS, PAD, nxt).astype(jnp.int32)
            toks = jax.lax.dynamic_update_slice(
                toks, out_t[:, None], (0, t + 1)
            )
            alive = alive & (nxt != EOS)
            return (toks, alive), out_t

        toks0 = jnp.zeros((N, MAX_OUT), jnp.int32).at[:, 0].set(BOS)
        alive0 = jnp.ones((N,), bool)
        (_, _), outs = jax.lax.scan(
            one_t, (toks0, alive0),
            jnp.arange(MAX_OUT - 1, dtype=jnp.int32),
        )
        outs = outs.T  # [N, MAX_OUT-1]
        ref = dev_ref[:, :MAX_OUT - 1]
        hit = (outs == ref).all(1) & (dev_ref[:, MAX_OUT - 1] == PAD)
        return hit.mean()

    best = -1.0
    best_params = None
    tail = []  # last --avg-tail epochs' params, for weight averaging
    t0 = time.time()
    gkey = jax.random.PRNGKey(SEED + 1)
    n_used = steps_per_epoch * args.batch
    for epoch in range(args.epochs):
        perm = rng.permutation(len(epoch_pairs))[:n_used].astype(np.int32)
        perm = perm.reshape(steps_per_epoch, args.batch)
        gkey, ekey = jax.random.split(gkey)
        params, opt_state, ep_loss = run_epoch(
            params, opt_state, jnp.asarray(perm), ekey
        )
        acc = float(dev_accuracy(params))
        print(f"epoch {epoch + 1:3d}  loss {float(ep_loss):.4f}"
              f"  dev-word-acc {acc:.4f}  ({time.time() - t0:.0f}s)",
              flush=True)
        host = jax.tree.map(np.asarray, params)
        if acc > best:
            best = acc
            best_params = host
        if args.avg_tail > 1:
            tail.append(host)
            if len(tail) > args.avg_tail:
                tail.pop(0)
    print(f"best dev word accuracy: {best:.4f}")

    # tail weight averaging (Polyak-style over the cosine-decay plateau):
    # averaged weights usually beat the single best epoch on exact match.
    # Keep whichever scores higher on dev.
    if args.avg_tail > 1 and len(tail) > 1:
        avg = {
            k: np.mean([t[k] for t in tail], axis=0)
            for k in tail[0]
        }
        acc_avg = float(dev_accuracy(
            jax.tree.map(jnp.asarray, avg)
        ))
        print(f"tail-avg({len(tail)}) dev word accuracy: {acc_avg:.4f}")
        if acc_avg >= best:
            best, best_params = acc_avg, avg
    print(f"saving dev word accuracy: {best:.4f}")

    out = {k: v.astype(np.float16) for k, v in best_params.items()}
    out["__config__"] = np.frombuffer(
        json.dumps(cfg).encode("utf-8"), dtype=np.uint8
    )
    np.savez_compressed(args.out, **out)
    print(f"wrote {args.out} ({os.path.getsize(args.out) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
