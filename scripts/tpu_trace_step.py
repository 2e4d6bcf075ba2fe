"""Capture a jax.profiler device trace of one bench train step."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench

state, step, batch, tracks = bench.build()
epoch = jax.numpy.asarray(25)

# warm up / compile
state, loss, _ = step(state, epoch, None, batch, tracks, None, None)
print("warm loss", float(loss))

out = "/tmp/jax-trace"
with jax.profiler.trace(out):
    for _ in range(2):
        state, loss, _ = step(state, epoch, None, batch, tracks, None, None)
        _ = float(loss)
print("trace done ->", out)
