"""Link extraction — the reference's one UDTF (F1, Crawling.go:14-48),
as a vectorized Arrow/pandas stage.

The reference tokenizes HTML one token at a time per URL per RPC; here a
whole Arrow batch of pages is expanded in one Python call and `explode`
semantics are produced directly as output rows. The fixture link rule
already encodes the reference's quirks (1000-token cap → empty, fetch
error → empty, per-page dedup, dead-link filter) — see
fixtures/corpus.py.

Output columns: (parent_url, url, host) — host computed in the same pass
(it is a pure function of the target id), url_hash added JVM-side by the
caller via functions.urls.url_hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..fixtures import corpus as C

EXTRACT_SCHEMA = "parent_url string, url string, host string"


def extract_links(fetched: DataFrame, spec: C.CorpusSpec) -> DataFrame:
    """fetched: DataFrame with at least (url) of successfully admitted
    pages. Returns one row per extracted+validated link (F1+F2+U1)."""

    def expand(batches):
        import pandas as pd

        for pdf in batches:
            parents, urls, hosts = [], [], []
            for purl in pdf["url"]:
                try:
                    i = C.index_of_url(purl)
                except (ValueError, IndexError):
                    continue  # not a corpus URL ⇒ unfetchable ⇒ no links (worker.go:153)
                if not (0 <= i < spec.n) or C.url_of(i, spec) != purl:
                    # round-trip check: a foreign-host URL that merely ends in
                    # /p/<i> must not resolve to page i's links
                    continue
                for t in C.out_links(i, spec):
                    parents.append(purl)
                    urls.append(C.url_of(t, spec))
                    hosts.append(C.host_name(C.host_of(t, spec)))
            yield pd.DataFrame({"parent_url": parents, "url": urls, "host": hosts})

    return fetched.select("url").mapInPandas(expand, schema=EXTRACT_SCHEMA)
