import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print("device:", jax.devices()[0])

def conv(x, k, strides=1, pad=0, out_t=None):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, k, (strides, strides), [(pad, pad)] * 2,
        dimension_numbers=dn, preferred_element_type=out_t)

def bench(fn, *args, iters=30):
    g = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(jax.device_get(g(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    float(jax.device_get(out))
    return (time.perf_counter() - t0) / iters * 1e3

rng = np.random.default_rng(0)
for (B, H, W, Cin, Cout, kk) in [
    (32, 200, 336, 64, 64, 3),
    (32, 200, 336, 256, 64, 1),
    (32, 200, 336, 64, 256, 1),
    (32, 100, 168, 128, 128, 3),
    (32, 50, 84, 256, 256, 3),
    (32, 25, 42, 512, 512, 3),
]:
    xb = jnp.asarray(rng.normal(0, 1, (B, H, W, Cin)).astype(np.float32)).astype(jnp.bfloat16)
    kb = jnp.asarray(rng.normal(0, 0.1, (kk, kk, Cin, Cout)).astype(np.float32)).astype(jnp.bfloat16)
    xi = jnp.asarray(rng.integers(-127, 127, (B, H, W, Cin)), jnp.int8)
    ki = jnp.asarray(rng.integers(-127, 127, (kk, kk, Cin, Cout)), jnp.int8)
    pad = (kk - 1) // 2
    t_bf = bench(lambda x, k: conv(x, k, 1, pad), xb, kb)
    try:
        t_i8 = bench(lambda x, k: conv(x, k, 1, pad, jnp.int32), xi, ki)
    except Exception as e:
        t_i8 = float("nan"); print("int8 failed:", type(e).__name__, str(e)[:150])
    gf = B*H*W*Cin*Cout*kk*kk*2/1e9
    print(f"[{B},{H},{W},{Cin}]x{kk}x{kk}->{Cout} ({gf:.0f} GFLOP): bf16 {t_bf:7.2f} ms ({gf/t_bf:.0f} TF/s)  int8 {t_i8:7.2f} ms")
