"""Production-wave ABAB: watertight vs LEAF_MT leaf test, end-to-end.

The raw-kernel A/B (r5_mt_ab.py) showed MT +12% on coherent primaries,
~-3% on incoherent bounces (noise-level) with 1.000000 hit agreement on
the bench scene.  The decisive number is the steady-state production
wave (the bench headline): this times one 16-spp wave over 4 pixel
blocks per variant, interleaved twice, flags flipped by monkeypatch +
jax.clear_caches(), scene rebuilt per variant so tiles match the kernel.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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
    import shimmer_tpu.ops.bvh8 as B8
    import shimmer_tpu.ops.pallas.traverse as T
    from shimmer_tpu.render import make_wavefront_renderer, pixel_blocks
    from shimmer_tpu.samplers import ZSobolSampler

    results = {}
    means = {}
    for pass_i, variant in enumerate(
        ("watertight", "mt", "watertight", "mt")
    ):
        B8.LEAF_MT = variant == "mt"
        T.LEAF_MT = variant == "mt"
        jax.clear_caches()
        scene, cam, film, n_tri = B.build_bench_scene(300000)
        sampler = ZSobolSampler(16, film.resolution)
        wave_fn = make_wavefront_renderer(
            scene, cam, film, sampler, max_depth=5, with_stats=True
        )
        blocks, valids = pixel_blocks(film, 1 << 17)
        state = film.init_state()
        idx = jnp.arange(16, dtype=jnp.uint32)
        t0 = time.time()
        state, st = wave_fn(state, idx, blocks[0], valids[0])
        jax.block_until_ready(state)
        print(f"[{variant} #{pass_i}] compile+block0: "
              f"{time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        rays = 0.0
        for b in range(1, 5):
            state, st = wave_fn(state, idx, blocks[b], valids[b])
            rays += float(st["rays"])
        jax.block_until_ready(state)
        dt = time.time() - t0
        mr = rays / dt / 1e6
        mean = float(jnp.mean(film.get_image(state)))
        print(f"[{variant} #{pass_i}] wave 4 blocks: {mr:.3f} Mrays/s "
              f"(img mean {mean:.5f})", flush=True)
        results.setdefault(variant, []).append(mr)
        means.setdefault(variant, []).append(mean)
    wt, mt = results["watertight"], results["mt"]
    print(f"WAVE SPEEDUP mt: {max(mt)/max(wt):.3f}x "
          f"(wt={[round(x,3) for x in wt]} mt={[round(x,3) for x in mt]})",
          flush=True)
    print(f"img means wt={means['watertight']} mt={means['mt']}", flush=True)


if __name__ == "__main__":
    main()
