import time
import jax, jax.numpy as jnp, numpy as np
from overlapnet_tpu.core.jax_setup import enable_persistent_cache
enable_persistent_cache()
from bench import time_chained
from overlapnet_tpu.core.config import OverlapNetConfig
from overlapnet_tpu.models import build_model, init_params
from overlapnet_tpu.models.siamese import OverlapNet
import dataclasses

rng = np.random.default_rng(0)
B = 256
fa = jnp.asarray(rng.normal(size=(B, 360, 128)).astype(np.float32) * 0.05)
fb = jnp.asarray(rng.normal(size=(B, 360, 128)).astype(np.float32) * 0.05)

cfg0 = OverlapNetConfig()
params = init_params(cfg0.model, 4, rng=0)

variants = {
    "fft_fp32":   dict(correlation_method="fft",  compute_dtype="float32"),
    "conv_fp32":  dict(correlation_method="conv", compute_dtype="float32"),
    "fft_bf16":   dict(correlation_method="fft",  compute_dtype="bfloat16"),
}
for name, kw in variants.items():
    mcfg = dataclasses.replace(cfg0.model, **kw)
    model = build_model(mcfg)
    def body(carry, model=model):
        fa_c, acc = carry
        overlap, logits = model.apply(params, fa_c, fb, method=OverlapNet.score)
        acc = acc + jnp.sum(overlap) + jnp.sum(logits) * 1e-6
        return fa_c + acc * 1e-20, acc
    dt = time_chained(body, (fa, jnp.zeros(())))
    print(f"head {name}: {dt*1e3:.3f} ms/B{B} -> {B/dt:.0f} pairs/s", flush=True)

# legs fp32 vs bf16
x = jnp.asarray(rng.normal(size=(32, 64, 900, 4)).astype(np.float32) * 0.1)
for name, kw in [("fp32", dict(compute_dtype="float32")), ("bf16", dict(compute_dtype="bfloat16"))]:
    mcfg = dataclasses.replace(cfg0.model, **kw)
    model = build_model(mcfg)
    def body(carry, model=model):
        x_c, acc = carry
        fv = model.apply(params, x_c, method=OverlapNet.encode)
        acc = acc + jnp.sum(fv.astype(jnp.float32)) * 1e-6
        return x_c + acc * 1e-20, acc
    dt = time_chained(body, (x, jnp.zeros(())))
    print(f"legs {name}: {dt*1e3:.3f} ms/B32 -> {32/dt:.0f} scans/s", flush=True)
