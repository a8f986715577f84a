"""Tiny TPU liveness probe: attach, settle 30s, one matmul readback."""
import time, sys
import jax
print("devices:", jax.devices(), flush=True)
time.sleep(30)
import jax.numpy as jnp
t0 = time.time()
x = jnp.ones((256, 256), jnp.float32)
v = float((x @ x).sum())
print(f"probe ok: {v} in {time.time()-t0:.1f}s", flush=True)
