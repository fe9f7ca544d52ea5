"""Tables as DIRECTORIES of parquet shards (what the engine's own
partitioned sinks and any at-scale layout produce) must behave exactly
like the single-file layout."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def sharded_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sharded"))
    for t in TABLES:
        src = os.path.join(SF, f"{t}.parquet")
        if t in ("documents", "lineitem"):
            # split into 3 shard files under a .parquet DIRECTORY
            tbl = pq.read_table(src)
            d = os.path.join(root, f"{t}.parquet")
            os.makedirs(d)
            n = tbl.num_rows
            for i in range(3):
                pq.write_table(tbl.slice(i * n // 3,
                                         (i + 1) * n // 3 - i * n // 3),
                               os.path.join(d, f"part-{i}.parquet"))
        else:
            os.symlink(src, os.path.join(root, f"{t}.parquet"))
    return root


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("qname", ["q1_pricing_summary", "doc_token_stats",
                                   "q18_large_volume_orders", "top_bigrams"])
def test_sharded_equals_single_file(ray_session, sharded_dir, qname):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E
    q = E.queries()[qname]

    def run(sf):
        r = q(sf)
        return r if isinstance(r, pd.DataFrame) else r.to_pandas()

    pd.testing.assert_frame_equal(_canon(run(sharded_dir)), _canon(run(SF)))
