from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from search_engine_spark.operators.textstats import filter_funnel, gopher_filter


def test_gopher_rules_each_fire(spark):
    good = "the quick brown fox jumps over a lazy dog near the riverbank today"
    rows = [
        (0, good),                                        # passes all
        (1, "the cat sat"),                               # too short
        (2, "the " + "internationalization " * 20),       # awl too high (needs 'the' x1 -> still >10? avg=(3+20*22)/21≈21 ok) but only 1 distinct stopword
        (3, good + " 1234567890 2345678901 3456789012 4567890123 5678901234 6789012345 7890123456"),  # digit ratio high
        (4, "the a " + "spam " * 40),                     # low uniq ratio
        (5, "zz qq ww ee rr tt yy uu ii oo pp aa ss dd"), # no stopwords
        (6, None),                                        # null text -> fails short
    ]
    t = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_filter(t).collect()}
    assert out[0].keep
    assert not out[1].keep and not out[1].ok_len
    assert not out[2].keep and not out[2].ok_awl and not out[2].ok_stop
    assert not out[3].keep and not out[3].ok_digit
    assert not out[4].keep and not out[4].ok_uniq
    assert not out[5].keep and not out[5].ok_stop
    assert not out[6].keep and not out[6].ok_len and out[6].n_tokens == 0

    f = filter_funnel(gopher_filter(t)).collect()[0]
    assert f.n_docs == 7 and f.n_keep == 1
    assert f.fail_len == 2 and f.fail_stop >= 2
    assert abs(f.keep_rate - 1 / 7) < 1e-6
