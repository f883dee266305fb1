"""In-process ABAB: dispatch block 2^17 vs 2^18 lanes with sort-on.

The r4 block sweep picked 2^17 before ray sorting was default; a sorted
bigger batch has better packet coherence and fewer drain tails, so
re-test.  Steady-state Mrays/s over the post-compile blocks.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    print("devices:", jax.devices(), flush=True)
    x = float(jnp.ones((8, 8)).sum())
    print(f"probe ok ({x})", flush=True)

    import bench as B
    from shimmer_tpu.render import make_wavefront_renderer, pixel_blocks
    from shimmer_tpu.samplers import ZSobolSampler

    scene, cam, film, n_tri = B.build_bench_scene(300000)
    sampler = ZSobolSampler(16, film.resolution)
    idx = jnp.arange(16, dtype=jnp.uint32)

    results = {}
    for pass_i, lb in enumerate((17, 18, 17, 18)):
        jax.clear_caches()
        wave_fn = make_wavefront_renderer(
            scene, cam, film, sampler, max_depth=5, with_stats=True
        )
        blocks, valids = pixel_blocks(film, 1 << lb)
        nb = blocks.shape[0]
        state = film.init_state()
        t0 = time.time()
        state, st = wave_fn(state, idx, blocks[0], valids[0])
        _ = float(st["rays"])
        print(f"[2^{lb} #{pass_i}] compile+block0: {time.time()-t0:.1f}s "
              f"({nb} blocks)", flush=True)
        t0 = time.time()
        rays = 0.0
        timed = min(nb - 1, 4)
        for b in range(1, 1 + timed):
            state, st = wave_fn(state, idx, blocks[b], valids[b])
            rays += float(st["rays"])
        mr = rays / (time.time() - t0) / 1e6
        mean = float(jnp.mean(film.get_image(state)))
        print(f"[2^{lb} #{pass_i}] wave ({timed} blocks): {mr:.3f} Mrays/s "
              f"(img mean {mean:.5f})", flush=True)
        results.setdefault(lb, []).append(mr)
    base = max(results[17])
    for lb in (17, 18):
        r = results[lb]
        print(f"BLOCK 2^{lb}: best {max(r):.3f} "
              f"({[round(x, 3) for x in r]}) speedup {max(r)/base:.3f}x",
              flush=True)


if __name__ == "__main__":
    main()
