"""Hardware check: example-chunked dropout masks are block-size invariant.

The r5 chunked PRNG seeding (ops/block.py::_drop_mask_ex) is what makes
DMT_BLOCK_NB_BWD legal while dropout is active: forward (nb_f) and
backward (nb_b) regenerate identical per-example masks whenever both are
multiples of _CHUNK.  The Mosaic CPU interpreter's prng_random_bits
returns constant bits, so this property is only observable on real TPU —
this script asserts it there:

  1. forward outputs with dropout ON are (tight-tolerance) equal across
     DMT_BLOCK_NB 16/32/64 — same masks, only matmul-shape noise;
  2. value+grad with dropout ON are equal between the default bwd nb and
     DMT_BLOCK_NB_BWD=16/32 — the replay regenerates the fwd's masks;
  3. dropout actually drops (train output != eval output).

Run:  timeout 1800 python scripts/block_nb_verify_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from cikm2020_dmt_tpu.ops.block import fused_encode_decode
from cikm2020_dmt_tpu.core.config import TransformerConfig
from cikm2020_dmt_tpu.nn.transformer import transformer_init


def main() -> None:
    # chunked seeding engages only while DMT_BLOCK_NB_BWD is present
    # (the default path keeps the cheaper legacy stream); presence with
    # an empty value means "chunked masks, default bwd size"
    os.environ.setdefault("DMT_BLOCK_NB_BWD", "")
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    B, T, D = 64, 50, 80
    seq = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    tar = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    lens = 1 + (np.arange(B) * 11) % 50
    mask = jnp.asarray((np.arange(T)[None] < lens[:, None])
                       .astype(np.float32))
    tc = TransformerConfig(
        d_model=80, num_heads=4, d_ff=320, maxlen_k=50, maxlen_q=1,
        num_blocks_encode=1, num_blocks_decode=1, dropout_rate=0.3,
        position_encoding_method="position_sin_cos",
        is_decoder_add_pos_emb=False)
    params = transformer_init(jax.random.PRNGKey(9), tc)
    key = jax.random.PRNGKey(7)

    def fwd(train):
        return fused_encode_decode(
            params["enc"][0], params["dec"][0], enc_in=seq, dec_in=tar,
            seq_mask=mask, num_heads=4, dropout=0.3, train=train, rng=key)

    def loss(seq, tar):
        out = fused_encode_decode(
            params["enc"][0], params["dec"][0], enc_in=seq, dec_in=tar,
            seq_mask=mask, num_heads=4, dropout=0.3, train=True, rng=key)
        return jnp.sum(out ** 2)

    # 1. forward mask invariance across block sizes
    outs = {}
    for nb in ("16", "32", "64"):
        os.environ["DMT_BLOCK_NB"] = nb
        try:
            outs[nb] = np.asarray(fwd(True))
        finally:
            del os.environ["DMT_BLOCK_NB"]
    for nb in ("16", "32"):
        d = np.abs(outs[nb] - outs["64"]).max()
        ok = np.allclose(outs[nb], outs["64"], rtol=2e-4, atol=2e-4)
        print(f"fwd nb={nb} vs 64: max|diff|={d:.3e} invariant={ok}",
              flush=True)
        assert ok, "forward dropout masks are NOT block-size invariant"

    # 2. backward mask replay across bwd block sizes
    grads = {}
    for nb_bwd in ("", "16", "32"):
        os.environ["DMT_BLOCK_NB_BWD"] = nb_bwd
        try:
            grads[nb_bwd] = jax.value_and_grad(loss, argnums=(0, 1))(
                seq, tar)
        finally:
            del os.environ["DMT_BLOCK_NB_BWD"]
    for nb_bwd in ("16", "32"):
        v0, g0 = grads[""]
        v1, g1 = grads[nb_bwd]
        assert float(v0) == float(v1), (float(v0), float(v1))
        for name, a, b in zip(("dseq", "dtar"), g0, g1):
            d = np.abs(np.asarray(a) - np.asarray(b)).max()
            ok = np.allclose(np.asarray(a), np.asarray(b),
                             rtol=2e-3, atol=2e-4)
            print(f"bwd nb={nb_bwd or 'default'} {name}: "
                  f"max|diff|={d:.3e} replay_ok={ok}", flush=True)
            assert ok, "backward dropout replay diverged"

    # 3. dropout is live
    delta = np.abs(np.asarray(fwd(True)) - np.asarray(fwd(False))).max()
    print(f"train-vs-eval max|diff|={delta:.3e} (must be >0)", flush=True)
    assert delta > 1e-3, "dropout inert on hardware?"
    print("BLOCK_NB_VERIFY_OK", flush=True)


if __name__ == "__main__":
    main()
