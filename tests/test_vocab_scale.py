"""Retrieval at scale (VERDICT r4 #6): a device-trained 10k-word
vocabulary over a few-hundred-keyframe database must stay discriminative
and batched. The 100k-word chip run (tools/train_large_vocab.py, results
in PROGRESS.md) proves the same machinery one order larger; this test
keeps the property under CI.

Reference scale anchor: ORBvoc is k=10 L=6 (~1M words) over a ~1M-image
corpus (/root/reference/src/System.cc:134-141); KeyFrameDatabase scoring
walks an inverted file (src/KeyFrameDatabase.cc) — here one [K, W]
min/sum pass scores the whole database at once.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ygz_tpu.matching import vocabulary


N_PLACES = 256
DESC_PER_PLACE = 120


@pytest.fixture(scope="module")
def world():
    """Synthetic 'places': descriptor clusters with intra-place bit noise.

    Each place has a pool of base descriptors; two views of the same
    place share ~70% of their descriptors (with a few bit flips), two
    different places share none — a sharpened model of what revisit
    imagery does to ORB descriptors."""
    rng = np.random.RandomState(42)
    base = [rng.randint(0, 2 ** 32, (DESC_PER_PLACE, 8), dtype=np.uint32)
            for _ in range(N_PLACES)]

    def view(p, seed):
        r = np.random.RandomState(seed)
        d = base[p].copy()
        keep = r.rand(DESC_PER_PLACE) < 0.7
        d[~keep] = r.randint(0, 2 ** 32, ((~keep).sum(), 8),
                             dtype=np.uint32)
        # a few bit flips on the kept ones
        flips = r.randint(0, 2 ** 32, d.shape, dtype=np.uint32) \
            & r.randint(0, 2 ** 32, d.shape, dtype=np.uint32) \
            & r.randint(0, 2 ** 32, d.shape, dtype=np.uint32) \
            & r.randint(0, 2 ** 32, d.shape, dtype=np.uint32)
        d[keep] ^= flips[keep]
        return d

    corpus = np.concatenate([view(p, 1000 + p) for p in range(N_PLACES)])
    vocab = vocabulary.train_vocabulary_device(corpus, k=10, L=4, seed=0,
                                               iters=4)
    return base, view, vocab


def _bow(vocab, d):
    m = jnp.ones((len(d),), bool)
    w = vocabulary.transform(vocab, jnp.asarray(d), m)
    return vocabulary.bow_vector(vocab, w, m)


class TestRetrievalAtScale:
    def test_database_top1(self, world):
        """Query views of 32 random places against the full 256-KF
        database: top-1 must be the right place >= 90% of the time, and
        the whole database scores in ONE batched call."""
        base, view, vocab = world
        assert vocab.n_words == 10_000
        db = jnp.stack([_bow(vocab, base[p]) for p in range(N_PLACES)])
        mask = jnp.ones((N_PLACES,), bool)
        rng = np.random.RandomState(7)
        hits = 0
        probes = rng.choice(N_PLACES, 32, replace=False)
        for p in probes:
            q = _bow(vocab, view(int(p), 2000 + int(p)))
            s = np.asarray(vocabulary.score_against_database(q, db, mask))
            hits += int(np.argmax(s) == p)
        assert hits >= 29, f"top-1 {hits}/32"

    def test_min_score_gate_discriminates(self, world):
        """The DetectLoop-style min-score gate: a same-place revisit
        scores far above an unrelated place (the margin the covisible
        min-score gate relies on, LoopClosing.cc:104-216)."""
        base, view, vocab = world
        va = _bow(vocab, base[3])
        va2 = _bow(vocab, view(3, 999))
        vb = _bow(vocab, base[200])
        s_same = float(vocabulary.l1_score(va, va2))
        s_diff = float(vocabulary.l1_score(va, vb))
        assert s_same > 3.0 * s_diff, (s_same, s_diff)
