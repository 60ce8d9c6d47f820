"""Operator surface: every DataFrame-level operator the engine ships.

CDC/verify re-express the reference's capability core; the rest are
the scale extensions (SURVEY.md §7 M5 and beyond).
"""

from .cdc import (
    cdc_apply,
    compact,
    dedup_latest,
    live_view,
    register_live_view,
    stamp_changelog,
)
from .dedup import (
    bucket_pairs,
    exact_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    minhash_signatures_vectorized,
    shingle_pairs_jaccard,
    simhash_near_pairs,
    simhash_signatures,
)
from .rollup import rollup_increment, rollup_merge, rollup_read
from .similarity import (
    brute_force_topk,
    brute_force_topk_vectorized,
    ivf_topk,
    lsh_bucketed_pairs,
)
from .sketch import (
    cms_build,
    cms_estimate,
    cms_merge,
    hll_build,
    hll_estimate,
    hll_merge,
    theta_build,
    theta_estimate,
    theta_estimate_bounds,
    theta_merge,
    theta_set_estimate,
)
from .skew import salted_join, two_phase_agg
from .temporal import asof_join, range_join
from .verify import table_checksum, verify_counts, verify_diff

__all__ = [
    "asof_join",
    "brute_force_topk",
    "brute_force_topk_vectorized",
    "bucket_pairs",
    "cdc_apply",
    "cms_build",
    "cms_estimate",
    "cms_merge",
    "hll_build",
    "hll_estimate",
    "hll_merge",
    "theta_build",
    "theta_estimate",
    "theta_estimate_bounds",
    "theta_merge",
    "theta_set_estimate",
    "compact",
    "dedup_latest",
    "exact_dedup",
    "ivf_topk",
    "live_view",
    "lsh_bucketed_pairs",
    "minhash_lsh_candidates",
    "minhash_signatures",
    "minhash_signatures_vectorized",
    "range_join",
    "register_live_view",
    "rollup_increment",
    "rollup_merge",
    "rollup_read",
    "salted_join",
    "shingle_pairs_jaccard",
    "simhash_near_pairs",
    "simhash_signatures",
    "stamp_changelog",
    "table_checksum",
    "two_phase_agg",
    "verify_counts",
    "verify_diff",
]
