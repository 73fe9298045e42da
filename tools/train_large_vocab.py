"""Train a reference-scale visual vocabulary in-framework and prove
retrieval at that scale (VERDICT r4 #6).

The reference ships ORBvoc (k=10, L=6, ~1M words) trained offline on
real imagery (/root/reference/src/System.cc:134-141). This tool trains
k=10, L=5 (100k words) from ~half a million framework-native ORB
descriptors over synthetic worlds, entirely with the device trainer
(vocabulary.train_vocabulary_device), then measures:

  * device transform latency (tree descent, 1000 descs, 111k nodes)
  * bow_vector + score_against_database latency at K=256 keyframes
  * two-lap revisit retrieval: does the second lap's BoW query rank the
    same-pose first-lap frame top-1 among ~256 distinct-view frames?

Writes assets/vocab_synthetic_100k.npz and prints a JSON summary.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    d = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "..", "assets", "bench_cache")
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import synthetic
    from bench import synthetic_render_jittable
    from ygz_tpu.core import lie
    from ygz_tpu.core.camera import Camera
    from ygz_tpu.matching import vocabulary
    from ygz_tpu.ops import orb
    from ygz_tpu.pipeline import frame as fmod
    from ygz_tpu.utils.config import SlamConfig

    cam = Camera(fx=458.0, fy=457.0, cx=376.0, cy=240.0,
                 width=752, height=480)
    cfg = SlamConfig(camera=cam, fps=20.0, n_features=1000, n_levels=4,
                     scale_factor=2.0, ini_th_fast=12.0, min_th_fast=5.0,
                     detect_cell=32, detect_per_cell=5)

    # --- 1. descriptor corpus: many textures x viewpoints ---------------
    n_tex = int(os.environ.get("VOCAB_TEXTURES", "6"))
    frames_per = int(os.environ.get("VOCAB_FRAMES_PER_TEX", "90"))
    sel = orb._pattern_selector()
    descs = []
    t0 = time.perf_counter()
    for tex_seed in range(n_tex):
        tex = synthetic.make_texture(tex_seed, size=(1400, 2000))
        traj = synthetic.orbit_trajectory(frames_per, dt=0.08)
        render = jax.jit(lambda T: synthetic_render_jittable(tex, T, cam))
        for i, (_, T_cw) in enumerate(traj):
            img = render(T_cw)
            fr = fmod.make_frame(np.clip(np.asarray(img), 0, 255)
                                 .astype(np.uint8), i, 0.0, cfg)
            uv, lvl, ang, de, m, _ = fmod._extract_jit(fr.pyramid, sel, cfg)
            m = np.asarray(m)
            descs.append(np.asarray(de)[m])
    corpus = np.concatenate(descs)
    t_corpus = time.perf_counter() - t0
    print(f"[vocab] corpus: {len(corpus)} descriptors from "
          f"{n_tex}x{frames_per} frames in {t_corpus:.1f}s", flush=True)

    # --- 2. train k=10 L=5 (100k words) on device -----------------------
    t0 = time.perf_counter()
    vocab = vocabulary.train_vocabulary_device(corpus, k=10, L=5, seed=0)
    jax.block_until_ready(vocab.node_desc)
    t_train = time.perf_counter() - t0
    print(f"[vocab] trained k=10 L=5 ({vocab.n_words} words, "
          f"{vocab.node_desc.shape[0]} nodes) in {t_train:.1f}s", flush=True)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "..", "assets", "vocab_synthetic_100k.npz")
    np.savez_compressed(out_path, k=vocab.k, L=vocab.L,
                        node_desc=np.asarray(vocab.node_desc),
                        word_idf=np.asarray(vocab.word_idf))
    print(f"[vocab] -> {out_path} "
          f"({os.path.getsize(out_path) / 1e6:.1f} MB)", flush=True)

    # --- 3. device latency at scale -------------------------------------
    rng = np.random.RandomState(1)
    q_desc = jnp.asarray(corpus[rng.choice(len(corpus), 1000)])
    q_mask = jnp.ones((1000,), bool)

    tf = jax.jit(lambda de, m: vocabulary.transform(vocab, de, m))
    bv = jax.jit(lambda w, m: vocabulary.bow_vector(vocab, w, m))

    def timeit(fn, *args, n=50):
        o = fn(*args)
        jax.device_get(jax.tree.leaves(o)[0].reshape(-1)[:1])
        t = time.perf_counter()
        for _ in range(n):
            o = fn(*args)
        jax.device_get(jax.tree.leaves(o)[0].reshape(-1)[:1])
        return (time.perf_counter() - t) / n * 1e3, o

    t_tf, wids = timeit(tf, q_desc, q_mask)
    t_bv, qv = timeit(bv, wids, q_mask)
    K = 256
    db = jnp.asarray(rng.rand(K, vocab.n_words).astype(np.float32))
    db = db / jnp.sum(db, axis=1, keepdims=True)
    db_mask = jnp.ones((K,), bool)
    sc = jax.jit(lambda q: vocabulary.score_against_database(q, db, db_mask))
    t_sc, _ = timeit(sc, qv)
    print(f"[vocab] device latency: transform={t_tf:.2f} ms "
          f"bow={t_bv:.2f} ms score(K={K})={t_sc:.2f} ms", flush=True)

    # --- 4. two-lap revisit retrieval over ~256 distinct views ----------
    tex = synthetic.make_texture(7, size=(1400, 2000))  # UNSEEN texture
    n_kf = 128
    traj = synthetic.orbit_trajectory(n_kf, dt=0.12)
    render = jax.jit(lambda T: synthetic_render_jittable(tex, T, cam))
    vecs = []
    for i, (_, T_cw) in enumerate(traj):
        img = render(T_cw)
        fr = fmod.make_frame(np.clip(np.asarray(img), 0, 255)
                             .astype(np.uint8), i, 0.0, cfg)
        uv, lvl, ang, de, m, _ = fmod._extract_jit(fr.pyramid, sel, cfg)
        w = tf(de, m)
        vecs.append(bv(w, m))
    vecs = jnp.stack(vecs)
    # lap 2: same poses, small photometric perturbation (exposure+noise)
    hits1 = hits5 = 0
    rng2 = np.random.RandomState(3)
    for i, (_, T_cw) in enumerate(traj):
        img = np.asarray(render(T_cw))
        img = np.clip(img * rng2.uniform(0.85, 1.15)
                      + rng2.randn(*img.shape) * 4.0, 0, 255)
        fr = fmod.make_frame(img.astype(np.uint8), i, 0.0, cfg)
        uv, lvl, ang, de, m, _ = fmod._extract_jit(fr.pyramid, sel, cfg)
        qv = bv(tf(de, m), m)
        s = np.asarray(vocabulary.score_against_database(
            qv, vecs, jnp.ones((n_kf,), bool)))
        top = np.argsort(-s)
        hits1 += int(top[0] == i)
        hits5 += int(i in top[:5])
    print(f"[vocab] revisit retrieval over {n_kf} views: "
          f"top1={hits1 / n_kf:.2f} top5={hits5 / n_kf:.2f}", flush=True)

    print(json.dumps({
        "n_descriptors": int(len(corpus)), "n_words": int(vocab.n_words),
        "train_s": round(t_train, 1), "transform_ms": round(t_tf, 2),
        "bow_ms": round(t_bv, 2), "score_ms": round(t_sc, 2),
        "revisit_top1": round(hits1 / n_kf, 3),
        "revisit_top5": round(hits5 / n_kf, 3)}))


if __name__ == "__main__":
    main()
