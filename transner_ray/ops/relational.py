"""Relational operator suite over the driver's TPC-H-ish tables.

Each function takes ``sf_dir`` and returns a Ray ``Dataset`` (or small
pandas result). These are the engine's generic operator demonstrations
(SURVEY.md §2.2/2.4/2.5/2.6 Ray Data mappings): vectorized
``map_batches`` filters/projections, BROADCAST small-side joins
(ray.put + per-batch pandas merge — never a shuffle for a dimension
table), combiner pre-aggregation before every ``groupby`` (shuffle
volume = distinct keys × blocks, not rows), range-partitioned sorts,
and first-wins dedup.

Floating-point policy: every SUM/AVG of doubles is rounded (4 decimals)
in BOTH the Ray implementation and the oracle SQL, so distributed
summation order cannot flip the value-hash comparison.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from .dedup import _mix64


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    from .io import read_parquet_sized

    return read_parquet_sized(f"{sf_dir}/{table}.parquet", columns=columns)


def _rows(sf_dir: str, table: str) -> int | None:
    """Footer-only row count — sizes every bucketed reduce's fan-out."""
    from .io import parquet_num_rows

    return parquet_num_rows(f"{sf_dir}/{table}.parquet")


# ------------------------------------------------------------------ Q1-ish

def lineitem_pricing(sf_dir: str) -> rd.Dataset:
    """TPC-H Q1 shape: filter on shipdate, grouped sums/means/counts.
    Pre-aggregated per batch (partial sums) before the small groupby."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    cutoff = pa.scalar(pd.Timestamp("1998-09-01"), type=pa.timestamp("us"))

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        disc_price = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        t = t.append_column("disc_price", disc_price)
        df = t.to_pandas()
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            n=("l_quantity", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_disc_price", alias_name="sum_disc_price"),
            Sum("n", alias_name="n"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        avg_qty = pc.round(pc.divide(t["sum_qty"], pc.cast(t["n"], pa.float64())), 4)
        t = t.set_column(t.schema.get_field_index("sum_qty"), "sum_qty", pc.round(t["sum_qty"], 4))
        t = t.set_column(
            t.schema.get_field_index("sum_base_price"),
            "sum_base_price",
            pc.round(t["sum_base_price"], 4),
        )
        t = t.set_column(
            t.schema.get_field_index("sum_disc_price"),
            "sum_disc_price",
            pc.round(t["sum_disc_price"], 4),
        )
        return t.append_column("avg_qty", avg_qty)

    return out.map_batches(finish, batch_format="pyarrow").sort(["l_returnflag", "l_linestatus"])


LINEITEM_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
       count(*) AS n,
       round(sum(l_quantity) / count(*), 4) AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ------------------------------------------------- filter + projection

def high_quantity_items(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"])
    return ds.map_batches(
        lambda t: t.filter(pc.greater(t["l_quantity"], pa.scalar(45.0))),
        batch_format="pyarrow",
    )


HIGH_QUANTITY_ITEMS_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem WHERE l_quantity > 45
"""


# ------------------------------------------------------- sort + limit

def top_orders(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(20)


TOP_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""


# ------------------------------------------- broadcast dimension join

def customers_per_region(sf_dir: str) -> rd.Dataset:
    """customer ⋈ nation ⋈ region with the two dimension tables
    BROADCAST (ray.put once, merged per batch) — the J1 pattern."""
    nation = _read(sf_dir, "nation").to_pandas()
    region = _read(sf_dir, "region").to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")[
        ["n_nationkey", "r_name"]
    ]
    dim_ref = ray.put(dim)

    def join_batch(df: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(dim_ref)
        j = df.merge(d, left_on="c_nationkey", right_on="n_nationkey")
        g = j.groupby("r_name", as_index=False).agg(
            n_customers=("c_custkey", "size"), sum_acctbal=("c_acctbal", "sum")
        )
        return g

    from ray.data.aggregate import Sum

    out = (
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
        .map_batches(join_batch, batch_format="pandas")
        .groupby("r_name")
        .aggregate(
            Sum("n_customers", alias_name="n_customers"),
            Sum("sum_acctbal", alias_name="sum_acctbal"),
        )
    )
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("sum_acctbal"), "sum_acctbal", pc.round(t["sum_acctbal"], 4)
        ),
        batch_format="pyarrow",
    ).sort("r_name")


CUSTOMERS_PER_REGION_SQL = """
SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal), 4) AS sum_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


# ------------------------------------------- fact ⋈ dim + aggregate

def segment_revenue(sf_dir: str) -> rd.Dataset:
    """orders ⋈ customer(mktsegment) via ``Dataset.join`` (hash
    shuffle join, the priority_revenue pattern), revenue per segment.
    customer grows with the fact tables at TPC-H scale — it is NOT a
    broadcast-safe dimension (round 1 ray.put the whole table into
    every task); nation/region broadcasts (customers_per_region) stay
    broadcast because those are O(1)-sized."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = orders.join(
        cust,
        join_type="inner",
        num_partitions=8,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("c_mktsegment", as_index=False).agg(
            n_orders=("o_orderkey", "size"), revenue=("o_totalprice", "sum")
        )

    out = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("c_mktsegment")
        .aggregate(Sum("n_orders", alias_name="n_orders"), Sum("revenue", alias_name="revenue"))
    )
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("revenue"), "revenue", pc.round(t["revenue"], 4)
        ),
        batch_format="pyarrow",
    ).sort("c_mktsegment")


SEGMENT_REVENUE_SQL = """
SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 4) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# -------------------------------------------------- first-wins dedup

def first_event_per_user_type(sf_dir: str) -> rd.Dataset:
    """Exact keyed dedup, first-wins by id: keep the smallest event_id
    per (user_id, event_type). (The reference's key-dedup at
    parser.py:90-99 is dict-insert/LAST-wins — see
    ops/corpus.py::dedup_by_key_last_wins; this query demonstrates the
    deterministic argmin variant a pipeline usually wants.) Key
    cardinality is O(users) → the bucketed hash-aggregate, bucketed on
    user_id (a user's every event_type co-locates)."""
    from .agg import bucketed_group_reduce, hash_int_col

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["user_id", "event_type"], as_index=False).agg(
            first_event_id=("event_id", "min"), n=("event_id", "size")
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["user_id", "event_type"], as_index=False).agg(
            first_event_id=("first_event_id", "min"), n=("n", "sum")
        )

    return bucketed_group_reduce(
        _read(sf_dir, "events", ["event_id", "user_id", "event_type"]).map_batches(
            partial, batch_format="pandas"
        ),
        lambda df: hash_int_col(df["user_id"]),
        reduce,
        input_rows=_rows(sf_dir, "events"),
    ).sort(["user_id", "event_type"])


FIRST_EVENT_SQL = """
SELECT user_id, event_type, min(event_id) AS first_event_id, count(*) AS n
FROM events GROUP BY user_id, event_type ORDER BY user_id, event_type
"""


# ------------------------------------------------ tumbling window agg

def events_hourly(sf_dir: str) -> rd.Dataset:
    """Tumbling 1h window per event_type (streaming-shaped workload as
    a batch groupby on the truncated timestamp). Window-key
    cardinality grows with the covered time range (years × types →
    10^5+ keys) → bucketed hash-aggregate, bucketed on the hour."""
    from .agg import bucketed_group_reduce, hash_int_col

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df["hour"] = df["ts"].dt.floor("h")
        return df.groupby(["hour", "event_type"], as_index=False).agg(
            n=("event_id", "size"), sum_value=("value", "sum")
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["hour", "event_type"], as_index=False).agg(
            n=("n", "sum"), sum_value=("sum_value", "sum")
        )

    out = bucketed_group_reduce(
        _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"]).map_batches(
            partial, batch_format="pandas"
        ),
        lambda df: hash_int_col(df["hour"]),
        reduce,
        input_rows=_rows(sf_dir, "events"),
    )
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("sum_value"), "sum_value", pc.round(t["sum_value"], 4)
        ),
        batch_format="pyarrow",
    ).sort(["hour", "event_type"])


EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY hour, event_type
"""


# ------------------------------------------------ sliding window agg

SLIDE_ORIGIN = "2024-01-01"


def events_sliding(sf_dir: str) -> rd.Dataset:
    """Sliding window (60-min window, 15-min slide): events are
    pre-aggregated to their 15-min base bucket FIRST, and only the
    bucket PARTIALS are fanned out to the 4 window starts containing
    them (a 60-min window sum is exactly the sum of its four 15-min
    buckets) — the expansion and the shuffle see one row per distinct
    (bucket, type) per batch instead of 4 rows per event. Window-key
    cardinality grows with the time range → bucketed hash-aggregate,
    as events_hourly."""
    from .agg import bucketed_group_reduce, hash_int_col

    origin = pd.Timestamp(SLIDE_ORIGIN)

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "base": df["ts"].dt.floor("15min"),
                "event_type": df["event_type"],
                "value": df["value"],
            }
        ).groupby(["base", "event_type"], as_index=False).agg(
            n=("value", "size"), sum_value=("value", "sum")
        )
        frames = []
        for k in range(4):
            frames.append(
                pd.DataFrame(
                    {
                        "w_start": g["base"] - pd.Timedelta(minutes=15 * k),
                        "event_type": g["event_type"],
                        "n": g["n"],
                        "sum_value": g["sum_value"],
                    }
                )
            )
        out = pd.concat(frames, ignore_index=True)
        out = out[out["w_start"] >= origin]
        return out.groupby(["w_start", "event_type"], as_index=False).agg(
            n=("n", "sum"), sum_value=("sum_value", "sum")
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["w_start", "event_type"], as_index=False).agg(
            n=("n", "sum"), sum_value=("sum_value", "sum")
        )

    out = bucketed_group_reduce(
        _read(sf_dir, "events", ["ts", "event_type", "value"]).map_batches(
            expand, batch_format="pandas"
        ),
        lambda df: hash_int_col(df["w_start"]),
        reduce,
        input_rows=_rows(sf_dir, "events"),
    )
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("sum_value"), "sum_value", pc.round(t["sum_value"], 4)
        ),
        batch_format="pyarrow",
    ).sort(["w_start", "event_type"])


EVENTS_SLIDING_SQL = f"""
WITH ws AS (
  SELECT unnest(generate_series(TIMESTAMP '{SLIDE_ORIGIN}',
                                (SELECT max(ts) FROM events),
                                INTERVAL 15 MINUTE)) AS w_start
)
SELECT w_start, event_type, count(*) AS n, round(sum(value), 4) AS sum_value
FROM events e JOIN ws ON e.ts >= ws.w_start AND e.ts < ws.w_start + INTERVAL 60 MINUTE
GROUP BY w_start, event_type ORDER BY w_start, event_type
"""


# --------------------------------------------------------- distinct

def distinct_flag_status(sf_dir: str) -> rd.Dataset:
    """DISTINCT = per-batch pyarrow distinct (the combiner) + a
    vectorized groupby.aggregate over the partials — never a Python
    call per key (map_groups head(1) is one task per distinct key)."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate([])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .sort(["l_returnflag", "l_linestatus"])
    )


DISTINCT_FLAG_STATUS_SQL = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
ORDER BY l_returnflag, l_linestatus
"""


# ------------------------------------------------- union + augmentation

def union_lower_count(sf_dir: str) -> pd.DataFrame:
    """R5: dataset union'd with its lowercased copy (the reference's
    lowercase augmentation, wikiNER2CoNLL.py:22-25), then counted."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    lowered = docs.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "text": pc.utf8_lower(t["text"])}),
        batch_format="pyarrow",
    )
    n = docs.union(lowered).count()
    return pd.DataFrame({"n_rows": [n]})


UNION_LOWER_COUNT_SQL = """
SELECT count(*) AS n_rows FROM (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id, lower(text) FROM documents
)
"""


# ------------------------------------------------- sessionization

SESSION_GAP_MIN = 30


USER_BUCKETS = 64  # floor — grows with the events table, see below


def user_sessions(sf_dir: str) -> rd.Dataset:
    """Gap-based sessionization (the streaming-shaped workload of the
    guide): a new session starts after a >30-min silence. Partitioned
    hash-aggregate shape: users are hashed into buckets,
    ``groupby(bucket)`` co-locates each user's events, and ONE
    vectorized pandas pass per bucket sessionizes every user in it
    (sort + user-change/gap flags + cumsum) — at 10^8 users a per-user
    ``map_groups`` is one Python task per user; this is one per
    bucket. The bucket COUNT scales with the events table (this reduce
    holds RAW event rows, not partials, so a fixed 64 would hand each
    task 1/64 of the corpus at scale — and sort them). Returns one row
    per session."""
    from .agg import scaled_num_buckets

    nb = scaled_num_buckets(_rows(sf_dir, "events"), floor=USER_BUCKETS)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy().astype(np.uint64)
        df["bucket"] = (_mix64(u) % np.uint64(nb)).astype("int32")
        return df

    def sessionize_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        new_user = g["user_id"].ne(g["user_id"].shift())
        gap = g["ts"].diff() > pd.Timedelta(minutes=SESSION_GAP_MIN)
        sid = (new_user | gap).cumsum().astype("int64")
        out = g.groupby(sid).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("event_id", "size"),
        )
        return out.reset_index(drop=True)

    return (
        _read(sf_dir, "events", ["event_id", "user_id", "ts"])
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(sessionize_bucket, batch_format="pandas")
        .sort(["user_id", "session_start"])
    )


USER_SESSIONS_SQL = f"""
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events
FROM (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM (
    SELECT user_id, ts, event_id,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > INTERVAL {SESSION_GAP_MIN} MINUTE
                OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS is_new
    FROM events
  )
)
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


# ------------------------------------------------- top-k per group

BRAND_BUCKETS = 16  # floor — grows with the part table, see below


def top_parts_per_brand(sf_dir: str, k: int = 3) -> rd.Dataset:
    """Per-group top-k (row_number pattern): k most expensive parts per
    brand, ties broken by partkey. Two-level: a per-batch COMBINER
    takes each brand's local top-k (shuffle carries ≤ k rows per brand
    per block), then brands are hashed into buckets (count scaled to
    the part table) and one vectorized pandas pass per bucket finishes
    every brand in it — no per-brand Python task even at high brand
    cardinality."""
    from .agg import scaled_num_buckets

    nb = scaled_num_buckets(_rows(sf_dir, "part"), floor=BRAND_BUCKETS)

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["p_brand", "p_retailprice", "p_partkey"], ascending=[True, False, True])
        df = df.groupby("p_brand").head(k)
        key = pd.util.hash_pandas_object(df["p_brand"], index=False).to_numpy()
        df["bucket"] = (key % np.uint64(nb)).astype("int32")
        return df

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["p_brand", "p_retailprice", "p_partkey"], ascending=[True, False, True])
        return g.groupby("p_brand").head(k)[["p_partkey", "p_brand", "p_retailprice"]]

    return (
        _read(sf_dir, "part", ["p_partkey", "p_brand", "p_retailprice"])
        .map_batches(local_topk, batch_format="pandas")
        .groupby("bucket")
        .map_groups(bucket_topk, batch_format="pandas")
        .sort(["p_brand", "p_retailprice", "p_partkey"], descending=[False, True, False])
    )


TOP_PARTS_PER_BRAND_SQL = """
SELECT p_partkey, p_brand, p_retailprice FROM (
  SELECT p_partkey, p_brand, p_retailprice,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part
) WHERE rn <= 3
ORDER BY p_brand, p_retailprice DESC, p_partkey
"""


# ------------------------------------------------------- anti-join

BIG_ORDER_PRICE = 200_000.0

# anti-join strategy switch: exact key-array broadcast below this many
# distinct keys, Bloom prefilter + shuffle-join backstop above it
ANTI_JOIN_EXACT_MAX = 1 << 20
_BLOOM_BITS_PER_KEY = 16
_BLOOM_K = 8


def _bloom_positions(keys: np.ndarray, probe: int, m: int) -> tuple[np.ndarray, np.ndarray]:
    """(word index, bit mask) of each key's probe-th Bloom position."""
    salt = np.uint64(((probe + 1) * 0xA0761D6478BD642F) & ((1 << 64) - 1))
    h = _mix64(keys.astype(np.uint64) ^ salt) % np.uint64(m)
    return (h >> np.uint64(6)).astype(np.int64), np.uint64(1) << (h & np.uint64(63))


def _bloom_from_key_batches(keys_ds: rd.Dataset, column: str, m: int) -> np.ndarray:
    """Distributed Bloom build: each block folds its keys into a
    partial m-bit set (binary row); the driver ORs one bitset per
    block — it never holds the raw key set."""
    n_words = (m + 63) // 64

    def partial(t: pa.Table) -> pa.Table:
        keys = np.asarray(t[column]).astype(np.uint64)
        bits = np.zeros(n_words, dtype=np.uint64)
        for i in range(_BLOOM_K):
            w, b = _bloom_positions(keys, i, m)
            np.bitwise_or.at(bits, w, b)
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    out = np.zeros(n_words, dtype=np.uint64)
    # batch_size=None → one partial per BLOCK: keys_ds is coalesced to
    # a few blocks, so the fold transfers (blocks × m/8) bytes — not
    # one m-bit array per 1k-row batch (which would be quadratic in
    # the key count this path exists for)
    for blob in keys_ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).to_pandas()["bits"]:
        out |= np.frombuffer(blob, dtype=np.uint64)
    return out


def _bloom_maybe(bits: np.ndarray, m: int, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership probe: False = DEFINITELY absent (exact);
    True = maybe present (needs the exact backstop)."""
    res = np.ones(len(keys), dtype=bool)
    for i in range(_BLOOM_K):
        w, b = _bloom_positions(keys, i, m)
        res &= (bits[w] & b) != 0
    return res


def customers_without_big_orders(
    sf_dir: str, exact_max: int = ANTI_JOIN_EXACT_MAX
) -> rd.Dataset:
    """ANTI-join with a size-adaptive strategy. The big-order custkey
    set is first reduced to DISTINCT keys (combiner + groupby — the
    shuffle carries partials, not order rows). Below ``exact_max``
    distinct keys: broadcast the sorted key array once and filter per
    batch with np.isin (exact, no further shuffle). Above it: build a
    Bloom filter DISTRIBUTEDLY (one partial bitset per BLOCK of the
    coalesced distinct-key dataset, OR-folded on the driver — the
    driver never holds the key set and the fold sees a handful of
    bitsets, not one per 1k-row batch), broadcast the bits (~2
    bytes/key vs ≥8 for raw keys), keep every definitely-absent
    customer exactly, and route only the Bloom "maybe" rows (true
    members + ~0.04% false positives at 16 bits/key, k=8) through a
    shuffle left-outer join backstop so the result stays EXACT."""
    from .agg import bucketed_group_reduce, hash_int_col

    big_keys = (
        bucketed_group_reduce(
            _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
                # per-batch distinct combiner: the shuffle carries keys
                lambda t: t.filter(pc.greater(t["o_totalprice"], pa.scalar(BIG_ORDER_PRICE)))
                .group_by(["o_custkey"])
                .aggregate([]),
                batch_format="pyarrow",
            ),
            lambda df: hash_int_col(df["o_custkey"]),
            # _hit marks membership for the left-outer backstop below
            lambda g: g.drop_duplicates("o_custkey")[["o_custkey"]].assign(_hit=np.int8(1)),
            input_rows=_rows(sf_dir, "orders"),
        )
        .repartition(4)  # bound the bloom-partial count + heal empties
        .materialize()  # consumed 2-3x: count, bloom build, join backstop
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])

    n_big = big_keys.count()
    if n_big <= exact_max:
        keys = np.sort(big_keys.to_pandas()["o_custkey"].to_numpy())
        keys_ref = ray.put(keys)

        def anti(df: pd.DataFrame) -> pd.DataFrame:
            have = ray.get(keys_ref)
            return df[~np.isin(df["c_custkey"].to_numpy(), have)]

        return cust.map_batches(anti, batch_format="pandas").sort("c_custkey")

    m = int(max(64, n_big * _BLOOM_BITS_PER_KEY))
    bits_ref = ray.put(_bloom_from_key_batches(big_keys, "o_custkey", m))

    def split(keep_maybe: bool):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            maybe = _bloom_maybe(ray.get(bits_ref), m, df["c_custkey"].to_numpy().astype(np.uint64))
            return df[maybe] if keep_maybe else df[~maybe]

        return fn

    definite = cust.map_batches(split(False), batch_format="pandas")
    maybes = cust.map_batches(split(True), batch_format="pandas")
    rechecked = (
        maybes.join(
            big_keys,
            join_type="left_outer",
            num_partitions=4,
            on=("c_custkey",),
            right_on=("o_custkey",),
        )
        .map_batches(
            lambda df: df[df["_hit"].isna()][["c_custkey", "c_name", "c_acctbal"]],
            batch_format="pandas",
        )
    )
    return definite.union(rechecked).sort("c_custkey")


CUSTOMERS_WITHOUT_BIG_ORDERS_SQL = f"""
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > {BIG_ORDER_PRICE})
ORDER BY c_custkey
"""


# ------------------------------------------- large x large hash join

def priority_revenue(sf_dir: str) -> rd.Dataset:
    """Both-sides-large join: orders ⋈ lineitem via ``Dataset.join``
    (hash-partitioned on the key — the shuffle join; broadcast would
    not hold a fact table). Revenue per order priority."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    items = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def revenue_col(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"], "revenue": rev})

    joined = items.map_batches(revenue_col, batch_format="pyarrow").join(
        orders,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_orderpriority", as_index=False).agg(
            n_items=("revenue", "size"), revenue=("revenue", "sum")
        )

    out = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(Sum("n_items", alias_name="n_items"), Sum("revenue", alias_name="revenue"))
    )
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("revenue"), "revenue", pc.round(t["revenue"], 4)
        ),
        batch_format="pyarrow",
    ).sort("o_orderpriority")


PRIORITY_REVENUE_SQL = """
SELECT o_orderpriority, count(*) AS n_items,
       round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ----------------------------------------------- supplier dimension

def supplier_balance_by_nation(sf_dir: str) -> rd.Dataset:
    """supplier ⋈ nation (broadcast) → account-balance stats per
    nation, only nations with suppliers."""
    from ray.data.aggregate import Sum

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nation_ref = ray.put(nation)

    def join_batch(df: pd.DataFrame) -> pd.DataFrame:
        n = ray.get(nation_ref)
        j = df.merge(n, left_on="s_nationkey", right_on="n_nationkey")
        return j.groupby("n_name", as_index=False).agg(
            n_suppliers=("s_suppkey", "size"), sum_acctbal=("s_acctbal", "sum")
        )

    out = (
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"])
        .map_batches(join_batch, batch_format="pandas")
        .groupby("n_name")
        .aggregate(
            Sum("n_suppliers", alias_name="n_suppliers"),
            Sum("sum_acctbal", alias_name="sum_acctbal"),
        )
    )
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("sum_acctbal"), "sum_acctbal", pc.round(t["sum_acctbal"], 4)
        ),
        batch_format="pyarrow",
    ).sort("n_name")


SUPPLIER_BALANCE_SQL = """
SELECT n_name, count(*) AS n_suppliers, round(sum(s_acctbal), 4) AS sum_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


# ------------------------------------------------- JSON column parse

def event_props_stats(sf_dir: str) -> rd.Dataset:
    """Semi-structured column parsing: the events ``props`` JSON column
    parsed per batch (orjson-free stdlib json, vectorized aggregation
    after), grouped stats of the extracted ``k`` field per event_type."""
    import json

    from ray.data.aggregate import Max, Min, Sum

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        ks = [int(json.loads(p)["k"]) for p in df["props"]]
        out = pd.DataFrame({"event_type": df["event_type"], "k": ks})
        return out.groupby("event_type", as_index=False).agg(
            n=("k", "size"), sum_k=("k", "sum"), min_k=("k", "min"), max_k=("k", "max")
        )

    return (
        _read(sf_dir, "events", ["event_type", "props"])
        .map_batches(parse, batch_format="pandas")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_k", alias_name="sum_k"),
            Min("min_k", alias_name="min_k"),
            Max("max_k", alias_name="max_k"),
        )
        .sort("event_type")
    )


EVENT_PROPS_STATS_SQL = """
SELECT event_type, count(*) AS n,
       -- CAST the sum: DuckDB sum(BIGINT) yields HUGEINT, which lands in
       -- the comparison frame as float64 and breaks the value hash even
       -- when every value equals the engine's int64 (round-1 root cause)
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


# --------------------------------------------------------- part stats

def brand_stats(sf_dir: str) -> rd.Dataset:
    """A1 corpus-stats analogue on `part` (count / mean / max per key)."""
    from ray.data.aggregate import Max, Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("p_brand", as_index=False).agg(
            n=("p_partkey", "size"),
            sum_price=("p_retailprice", "sum"),
            max_size=("p_size", "max"),
        )

    out = (
        _read(sf_dir, "part", ["p_partkey", "p_brand", "p_retailprice", "p_size"])
        .map_batches(partial, batch_format="pandas")
        .groupby("p_brand")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_price", alias_name="sum_price"),
            Max("max_size", alias_name="max_size"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        avg_price = pc.round(pc.divide(t["sum_price"], pc.cast(t["n"], pa.float64())), 4)
        t = t.drop_columns(["sum_price"])
        return t.append_column("avg_price", avg_price)

    return out.map_batches(finish, batch_format="pyarrow").sort("p_brand")


BRAND_STATS_SQL = """
SELECT p_brand, count(*) AS n, max(p_size) AS max_size,
       round(sum(p_retailprice) / count(*), 4) AS avg_price
FROM part GROUP BY p_brand ORDER BY p_brand
"""


# ------------------------------------------------- running totals

def running_totals(sf_dir: str) -> rd.Dataset:
    """Per-user cumulative window aggregate: each event row gets its
    1-based sequence number and the running sum of ``value`` over the
    user's events ordered by (ts, event_id) — the ORDER BY window
    shape (``SUM ... OVER (PARTITION BY ... ORDER BY ...)``) that
    complements the gap-session (`user_sessions`) and sliding-window
    (`events_sliding`) operators. Same partitioned hash-aggregate
    contract: one bucketed shuffle by user, one vectorized pandas pass
    per bucket (sort + groupby cumsum/cumcount). The running sum is
    over CENTI-QUANTIZED values (int64 of round(value·2^20), the
    repo's exact-oracle recipe): integer addition is order-free, so
    the stream matches SQL's windowed SUM bit-for-bit — a float cumsum
    would differ at the ulp level from DuckDB's segment-tree
    summation order and flake the gate's round(6) compare."""
    from .agg import bucketed_group_reduce, hash_int_col, scaled_num_buckets

    nb = scaled_num_buckets(_rows(sf_dir, "events"), floor=USER_BUCKETS)

    def cumulate_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        g["_vq"] = np.floor(g["value"].to_numpy() * float(1 << 20) + 0.5).astype(
            "int64"
        )
        grp = g.groupby("user_id", sort=False)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": g["user_id"].to_numpy(),
                "seq": (grp.cumcount() + 1).to_numpy().astype("int64"),
                "running_value_q": grp["_vq"].cumsum().to_numpy().astype("int64"),
            }
        )

    return bucketed_group_reduce(
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"]),
        lambda df: hash_int_col(df["user_id"]),
        cumulate_bucket,
        num_buckets=nb,
    )


RUNNING_TOTALS_SQL = """
SELECT event_id, user_id,
       CAST(row_number() OVER w AS BIGINT) AS seq,
       CAST(SUM(CAST(floor(value * 1048576.0 + 0.5) AS BIGINT)) OVER w AS BIGINT) AS running_value_q
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# ---------------------------------------------------- lag deltas

def event_deltas(sf_dir: str) -> rd.Dataset:
    """Per-user LAG window: each event paired with the user's previous
    event's value and timestamp gap (seconds). First event per user is
    dropped (its LAG is NULL) so both engines emit identical row sets.
    The delta is one subtraction of identical operands on both sides —
    bit-exact, no quantization needed. Same one-bucketed-shuffle
    contract as running_totals."""
    from .agg import bucketed_group_reduce, hash_int_col, scaled_num_buckets

    nb = scaled_num_buckets(_rows(sf_dir, "events"), floor=USER_BUCKETS)

    def lag_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        grp = g.groupby("user_id", sort=False)
        prev_value = grp["value"].shift(1)
        prev_ts = grp["ts"].shift(1)
        keep = prev_value.notna().to_numpy()
        out = pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": g["user_id"].to_numpy(),
                "prev_value": prev_value.to_numpy(),
                "value_delta": (g["value"] - prev_value).to_numpy(),
                "gap_sec": (
                    (g["ts"] - prev_ts).dt.total_seconds()
                ).to_numpy(),
            }
        )
        return out[keep]

    return bucketed_group_reduce(
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"]),
        lambda df: hash_int_col(df["user_id"]),
        lag_bucket,
        num_buckets=nb,
    )


EVENT_DELTAS_SQL = """
SELECT event_id, user_id, prev_value,
       value - prev_value AS value_delta,
       date_diff('microsecond', prev_ts, ts) / 1000000.0 AS gap_sec
FROM (
  SELECT event_id, user_id, ts, value,
         lag(value) OVER w AS prev_value,
         lag(ts) OVER w AS prev_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
WHERE prev_value IS NOT NULL
"""


# ---------------------------------------------------------- pivot

PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(sf_dir: str) -> rd.Dataset:
    """Hourly × event-type PIVOT: one row per hour with a count column
    per (fixed, enumerated) event type — the conditional-aggregation
    reshape. Combiner partials per batch (a 5-column one-hot groupby),
    tiny groupby over hours: the wide schema is FIXED up front
    (``PIVOT_TYPES``), never discovered from the data — a
    data-dependent column set would make the schema a function of
    which blocks arrive first."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"hour": df["ts"].dt.floor("h")})
        et = df["event_type"].to_numpy()
        for t in PIVOT_TYPES:
            out[f"n_{t}"] = (et == t).astype("int64")
        return out.groupby("hour", as_index=False).sum()

    aggs = [Sum(f"n_{t}", alias_name=f"n_{t}") for t in PIVOT_TYPES]
    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("hour")
        .aggregate(*aggs)
        .sort("hour")
    )


EVENTS_PIVOT_SQL = f"""
SELECT date_trunc('hour', ts) AS hour,
       {", ".join(f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS n_{t}" for t in PIVOT_TYPES)}
FROM events
GROUP BY 1
ORDER BY hour
"""
