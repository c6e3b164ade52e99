"""Keyframe database: dense-BoW place recognition queries.

TPU-native `KeyFrameDatabase` (`orb_slam3/src/KeyFrameDatabase.cc`): the
inverted file disappears — with dense [K,W] BoW storage, "keyframes sharing
words" is one masked matmul, and every query (loop/merge/relocalization
candidates, merge possibility) is a fused batched pass:

  * common-word counts:        (q>0) . (B>0)^T           (bf16 MXU matmul)
  * min-common-words gate:     count >= 0.8 * max        (KeyFrameDatabase.cc:728)
  * L1 similarity:             1 - 0.5 |q - b|_1
  * covisibility accumulation: sum of scores over each candidate's top-10
    covisible neighbors                                   (:756-779)
  * DetectMergePossibility:    best accScore > 0.9 * baseline(bestKF)
                                                          (:789-808)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import vocabulary


class BowDatabase(NamedTuple):
    """Device state: dense BoW per keyframe slot."""

    bow: jnp.ndarray    # [K, W] float32 L1-normalized tf-idf
    valid: jnp.ndarray  # [K] bool


def create(kf_cap: int, n_words: int) -> BowDatabase:
    return BowDatabase(
        bow=jnp.zeros((kf_cap, n_words), jnp.float32),
        valid=jnp.zeros((kf_cap,), bool),
    )


@jax.jit
def add(db: BowDatabase, slot, bow) -> BowDatabase:
    return BowDatabase(
        bow=db.bow.at[slot].set(bow),
        valid=db.valid.at[slot].set(True),
    )


@jax.jit
def add_many(db: BowDatabase, slots, bows) -> BowDatabase:
    """Register a batch of keyframes in one device call: slots [n] int32,
    bows [n,W] (duplicate slots allowed — last write wins)."""
    return BowDatabase(
        bow=db.bow.at[slots].set(bows),
        valid=db.valid.at[slots].set(True),
    )


def _common_words(q, bows):
    qb = (q > 0).astype(jnp.bfloat16)
    bb = (bows > 0).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        bb, qb, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


@jax.jit
def accumulated_scores(db: BowDatabase, q, exclude, covis):
    """Covisibility-group-accumulated BoW scores of query `q` against the
    database (`CalculateMergeScore` / `DetectNBestCandidates` core).

    Args:
      q: [W] normalized BoW. exclude: [K] bool (own/covisible KFs to skip).
      covis: [K,K] int32 covisibility weights.
    Returns (acc_score [K], single_score [K], eligible [K]):
      acc_score[i] = score_i + sum of scores of i's top-10 covisible
      neighbors (eligible ones only); single_score = plain L1 score.
    """
    ok = db.valid & ~exclude
    cw = _common_words(q, db.bow) * ok
    max_cw = jnp.max(cw)
    min_cw = 0.8 * max_cw
    eligible = ok & (cw > jnp.maximum(min_cw, 0.0)) & (cw > 0)

    s = vocabulary.l1_score(q, db.bow)
    s = jnp.where(ok & (cw > 0), s, 0.0)          # scored iff sharing words
    s_gated = jnp.where(eligible, s, 0.0)

    # top-10 covisible neighbors of each KF
    K = covis.shape[0]
    top_w, top_i = jax.lax.top_k(covis, min(10, K))     # [K,10]
    neigh_scores = s[top_i] * (top_w > 0)               # only real neighbors
    acc = s_gated + jnp.where(s_gated > 0, jnp.sum(neigh_scores, axis=-1), 0.0)
    return acc, s, eligible


@jax.jit
def best_group_match(db: BowDatabase, q, exclude, covis):
    """(score, best_kf): max accumulated score, and the best single KF inside
    the winning group (the reference returns the neighbor with the highest
    single score, `KeyFrameDatabase.cc:762-779`)."""
    acc, s, eligible = accumulated_scores(db, q, exclude, covis)
    gi = jnp.argmax(acc)
    K = covis.shape[0]
    top_w, top_i = jax.lax.top_k(covis[gi], min(10, K))
    group = jnp.concatenate([gi[None], jnp.where(top_w > 0, top_i, gi)])
    best_in_group = group[jnp.argmax(s[group])]
    return acc[gi], best_in_group


@jax.jit
def detect_merge_possibility(db: BowDatabase, q, covis):
    """`KeyFrameDatabase::DetectMergePossibility` (`KeyFrameDatabase.cc:789`):
    score the foreign BoW against the whole local map; baseline = the same
    query run with the best-matching keyframe's own BoW (excluding itself);
    merge possible iff score > 0.9 * baseline.

    Returns (possible [] bool, best_kf [] int32, score, baseline)."""
    no_exclude = jnp.zeros(db.valid.shape, bool)
    score, best = best_group_match(db, q, no_exclude, covis)

    self_mask = jnp.zeros(db.valid.shape, bool).at[best].set(True)
    baseline, _ = best_group_match(db, db.bow[best], self_mask, covis)
    # a zero baseline means the best match has no own-map support at all —
    # the 0.9x rule is only meaningful against a positive baseline
    possible = (score > 0.0) & (baseline > 0.0) & (score > baseline * 0.9)
    return possible, best, score, baseline


@partial(jax.jit, static_argnames=("n",))
def detect_candidates(db: BowDatabase, q, exclude, covis, n: int = 3):
    """`DetectNBestCandidates` (`KeyFrameDatabase.cc:555`): top-n keyframes
    by accumulated group score, excluding the query's own covisible set.

    Returns (idx [n] int32, ok [n] bool)."""
    acc, s, eligible = accumulated_scores(db, q, exclude, covis)
    # each group is represented by its best single KF; rank groups by acc
    top_acc, top_gi = jax.lax.top_k(acc, n)
    K = covis.shape[0]

    def best_in(gi):
        top_w, top_i = jax.lax.top_k(covis[gi], min(10, K))
        group = jnp.concatenate([gi[None], jnp.where(top_w > 0, top_i, gi)])
        return group[jnp.argmax(s[group])]

    idx = jax.vmap(best_in)(top_gi)
    return idx, top_acc > 0.0
