"""Property-based check (hypothesis): the prefix-filtered ngram route vs a
brute-force all-pairs jaccard reference on randomized small corpora.

The seeded-corpus tests in test_docs_ops.py pin the planted cases; this
sweeps the space around them — tiny docs (alpha_pair <= 1 single-witness
pairs), duplicate texts (collapse branch), empty/short docs, and thresholds
drawn across the range.  The reference replays the documented contract:
jaccard over KEPT grams (weighted df <= max_doc_freq) with the unpruned
distinct-gram sizes in the union.
"""

import numpy as np
import pandas as pd
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from neo4j_graph_algorithms_ray.functions import text as T
from neo4j_graph_algorithms_ray.pipelines import docs as D

_VOCAB = [f"w{i}" for i in range(12)]

_corpus = st.lists(
    st.lists(st.integers(0, len(_VOCAB) - 1), min_size=0, max_size=12),
    min_size=2,
    max_size=25,
)


def _reference_pairs(texts, thr, mdf, k=3):
    """Brute-force: per-doc distinct gram sets, stop-gram prune by doc
    frequency, jaccard = |kept intersection| / (sz_a + sz_b - inter)."""
    sets, sizes = [], []
    H, c = T.batch_shingle_hashes(texts, k)
    off = 0
    for n in c:
        sets.append(set(H[off : off + n].tolist()))
        off += n
    sizes = [len(s) for s in sets]
    from collections import Counter

    df = Counter()
    for s in sets:
        df.update(s)
    kept = [{g for g in s if df[g] <= mdf} for s in sets]
    out = []
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(kept[i] & kept[j])
            if inter == 0:
                continue
            jac = inter / max(sizes[i] + sizes[j] - inter, 1)
            if jac >= thr:
                out.append((i, j, int(np.floor(jac * 1e6 + 0.5))))
    return sorted(out)


@given(
    rows=_corpus,
    thr=st.sampled_from([0.15, 0.4, 0.6, 0.85]),
    mdf=st.sampled_from([2, 4, 256]),
)
@settings(max_examples=12, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
def test_ngram_prefix_matches_bruteforce(ray_session, rows, thr, mdf):
    texts = [" ".join(_VOCAB[w] for w in r) for r in rows]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    got = D.ngram_jaccard_pairs(
        rd.from_pandas(df), threshold=thr, max_doc_freq=mdf, method="prefix"
    ).to_pandas()
    got_t = (
        sorted(zip(got["id_a"], got["id_b"], got["jac_u"])) if len(got) else []
    )
    assert got_t == _reference_pairs(texts, thr, mdf)
