import jax, jax.numpy as jnp, numpy as np, os
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from cikm2020_dmt_tpu.nn.transformer import encode_decode, transformer_init
from cikm2020_dmt_tpu.core.config import TransformerConfig

tc = TransformerConfig(d_model=80, num_heads=4, d_ff=320, maxlen_k=50,
                       num_blocks_encode=1, num_blocks_decode=1,
                       dropout_rate=0.1,
                       position_encoding_method="position_sin_cos")
rng = np.random.default_rng(0)
B, T, D = 64, 50, 80
seq = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
tar = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
lens = rng.integers(1, T + 1, size=B)
mask = jnp.asarray((np.arange(T)[None] < lens[:, None]).astype(np.float32))
params = transformer_init(jax.random.PRNGKey(0), tc)

def run(fused, train=False, key=None):
    os.environ["DMT_FUSED_BLOCK"] = "1" if fused else "0"
    try:
        def f(p, s, t):
            out = encode_decode(p, tc, seq_emb=s, seq_mask=mask,
                                tar_emb=t, train=train, rng=key)
            return jnp.sum(out ** 2)
        out = encode_decode(params, tc, seq_emb=seq, seq_mask=mask,
                            tar_emb=tar, train=train, rng=key)
        g = jax.grad(f)(params, seq, tar)
        return out, g
    finally:
        del os.environ["DMT_FUSED_BLOCK"]

print("backend:", jax.default_backend())
out_ref, g_ref = run(False)
out_k, g_k = run(True)
print("fwd max abs diff:", float(jnp.max(jnp.abs(out_k - out_ref))),
      "rel:", float(jnp.max(jnp.abs(out_k - out_ref)
                            / (jnp.abs(out_ref) + 1e-2))))
fr, _ = jax.tree.flatten(g_ref); fk, _ = jax.tree.flatten(g_k)
rel = max(float(jnp.max(jnp.abs(a - b) / (jnp.abs(a) + 1e-2)))
          for a, b in zip(fr, fk))
print("grad max rel diff:", rel)

o_eval, _ = run(True)
o1, _ = run(True, train=True, key=jax.random.PRNGKey(7))
o2, _ = run(True, train=True, key=jax.random.PRNGKey(7))
o3, _ = run(True, train=True, key=jax.random.PRNGKey(8))
print("same-seed equal:", bool(jnp.all(o1 == o2)),
      "diff-seed equal:", bool(jnp.all(o1 == o3)),
      "train==eval:", bool(jnp.all(o1 == o_eval)))
print("mean |train-eval| (dropout active):",
      float(jnp.mean(jnp.abs(o1 - o_eval))))
