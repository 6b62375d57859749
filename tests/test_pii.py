"""PII detection/scrub: counts, masking order, Python re oracle."""
import re

import pandas as pd

from hiselspark.operators.pii import EMAIL_RE, IPV4_RE, URL_RE, with_pii


def test_counts_and_masking(spark):
    rows = [
        (0, "mail me at a.b+c@ex-ample.co.uk please"),
        (1, "see https://ex.com/a?b=1 and http://x.y/z now"),
        (2, "server 10.0.0.1 and 192.168.1.255 up"),
        (3, "mixed bob@corp.io at https://corp.io/u from 8.8.8.8"),
        (4, "nothing here"),
        (5, "almost@an email @ nope http:/not a.url 1.2.3"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    out = (with_pii(spark.createDataFrame(pdf).repartition(2))
           .toPandas().set_index("doc_id").sort_index())
    for i, t in rows:
        assert out.loc[i, "n_email"] == len(re.findall(EMAIL_RE, t)), i
        assert out.loc[i, "n_url"] == len(re.findall(URL_RE, t)), i
        assert out.loc[i, "n_ip"] == len(re.findall(IPV4_RE, t)), i
        exp = re.sub(EMAIL_RE, "<EMAIL>", t)
        exp = re.sub(URL_RE, "<URL>", exp)
        exp = re.sub(IPV4_RE, "<IP>", exp)
        assert out.loc[i, "text_scrubbed"] == exp, i
    assert out.loc[0, "n_email"] == 1
    assert out.loc[1, "n_url"] == 2
    assert out.loc[2, "n_ip"] == 2
    assert out.loc[4, ["n_email", "n_url", "n_ip"]].sum() == 0
    assert out.loc[4, "text_scrubbed"] == "nothing here"


def test_scrub_is_idempotent(spark):
    pdf = pd.DataFrame({"doc_id": [0],
                        "text": ["x bob@corp.io https://a.b 1.2.3.4"]})
    once = with_pii(spark.createDataFrame(pdf)).select(
        "doc_id", "text_scrubbed")
    twice = with_pii(once.withColumnRenamed("text_scrubbed", "text"))
    r = twice.toPandas().iloc[0]
    assert r["text_scrubbed"] == "x <EMAIL> <URL> <IP>"
    assert r["n_email"] == r["n_url"] == r["n_ip"] == 0
