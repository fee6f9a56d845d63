"""TPC-H data generator + queries Q1/Q5/Q6/Q9 on the cudf_tpu engine.

TPU-native equivalent of the reference's NDS-H benchmark suite
(reference: cpp/benchmarks/ndsh/q01.cpp…q10.cpp, PDS-H runs in
docs/cudf/source/cudf_polars/benchmarks.md).  The generator produces the
TPC-H schema synthetically (uniform/zipf-ish distributions with the
official cardinality ratios) — enough for engine benchmarking and
differential validation against pandas; it is not the audited dbgen.

scale factor 1.0 ≈ 6M lineitem rows (rows scale linearly).
"""

from __future__ import annotations

import numpy as np

import cudf_tpu as ct
from cudf_tpu.engine import col, lit, from_dataframe
from cudf_tpu.engine.expr import when

_REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
_FLAGS = ["A", "N", "R"]
_STATUS = ["F", "O"]


def _dates(rng, n, start="1992-01-01", end="1998-12-01"):
    s = np.datetime64(start).astype("datetime64[D]").astype(np.int64)
    e = np.datetime64(end).astype("datetime64[D]").astype(np.int64)
    days = rng.integers(s, e, n)
    return days.astype("datetime64[D]").astype("datetime64[ns]")


def generate(scale: float = 0.01, seed: int = 0):
    """dict of cudf_tpu DataFrames for the TPC-H schema at `scale`."""
    rng = np.random.default_rng(seed)
    n_li = int(6_000_000 * scale)
    n_ord = int(1_500_000 * scale)
    n_cust = int(150_000 * scale)
    n_part = int(200_000 * scale)
    n_supp = max(int(10_000 * scale), 25)
    n_nation = 25
    n_region = 5

    nation = ct.DataFrame({
        "n_nationkey": np.arange(n_nation),
        "n_name": [f"NATION_{i:02d}" for i in range(n_nation)],
        "n_regionkey": np.arange(n_nation) % n_region,
    })
    region = ct.DataFrame({
        "r_regionkey": np.arange(n_region),
        "r_name": _REGIONS,
    })
    supplier = ct.DataFrame({
        "s_suppkey": np.arange(n_supp),
        "s_nationkey": rng.integers(0, n_nation, n_supp),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    })
    customer = ct.DataFrame({
        "c_custkey": np.arange(n_cust),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, n_nation, n_cust),
        "c_mktsegment": rng.choice(_SEGMENTS, n_cust),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
    })
    part = ct.DataFrame({
        "p_partkey": np.arange(n_part),
        "p_name": rng.choice(["green apple", "red truck", "blue sky",
                              "green forest", "yellow sun"], n_part),
        "p_type": rng.choice(["ECONOMY ANODIZED STEEL", "STANDARD BRUSHED COPPER",
                              "PROMO BURNISHED NICKEL"], n_part),
        "p_retailprice": np.round(rng.uniform(900, 2000, n_part), 2),
    })
    orders = ct.DataFrame({
        "o_orderkey": np.arange(n_ord),
        "o_custkey": rng.integers(0, max(n_cust, 1), n_ord),
        "o_orderstatus": rng.choice(_STATUS, n_ord),
        "o_totalprice": np.round(rng.uniform(800, 500000, n_ord), 2),
        "o_orderdate": _dates(rng, n_ord),
        "o_orderpriority": rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM"], n_ord),
    })
    lineitem = ct.DataFrame({
        "l_orderkey": rng.integers(0, max(n_ord, 1), n_li),
        "l_partkey": rng.integers(0, max(n_part, 1), n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.uniform(0.0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0.0, 0.08, n_li), 2),
        "l_returnflag": rng.choice(_FLAGS, n_li),
        "l_shipmode": rng.choice(["MAIL", "SHIP", "AIR", "TRUCK"], n_li),
        "l_linestatus": rng.choice(_STATUS, n_li),
        "l_shipdate": _dates(rng, n_li),
        "l_commitdate": _dates(rng, n_li),
        "l_receiptdate": _dates(rng, n_li),
    })
    return {
        "lineitem": lineitem, "orders": orders, "customer": customer,
        "supplier": supplier, "nation": nation, "region": region, "part": part,
    }


def generate_device(scale: float = 0.01, seed: int = 0):
    """TPC-H tables generated ON DEVICE with ``jax.random`` — no bulk
    host→device transfer (at SF1 the host generator ships ~600MB through
    ``device_put``, which has wedged the single-chip tunnel).  Strings are
    dictionary-encoded: int32 codes live on device, the (tiny) key sets on
    host — the layout every query path already handles.  Distributions
    match :func:`generate`; values differ (different RNG), which is fine
    for benchmarking and for differential tests that compare against
    ``to_pandas()`` of these same tables."""
    import jax
    import jax.numpy as jnp

    from cudf_tpu.core import dtypes as dt
    from cudf_tpu.core.column import Column

    n_li = int(6_000_000 * scale)
    n_ord = int(1_500_000 * scale)
    n_cust = int(150_000 * scale)
    n_part = int(200_000 * scale)
    n_supp = max(int(10_000 * scale), 25)
    n_nation, n_region = 25, 5

    # the whole random payload is ONE jitted program (one tunnel dispatch,
    # one compile — persisted in the jax cache per scale factor); ~30
    # individual randint/uniform dispatches measured 24-51 s over the
    # axon tunnel at any scale
    def _gen(key):
        state = [key]

        def _key():
            state[0], sub = jax.random.split(state[0])
            return sub

        def ints(lo, hi, n, dtype=jnp.int32):
            # key domains at bench scale factors fit int32 (what the
            # reference reads from SF<=100 parquet); int64 lanes are
            # emulated 2x-cost on the TPU vector unit
            return jax.random.randint(_key(), (n,), lo, hi, dtype=dtype)

        def money(lo, hi, n):
            u = jax.random.uniform(_key(), (n,), jnp.float64,
                                   float(lo), float(hi))
            return jnp.round(u * 100.0) / 100.0

        def dates(n, start="1992-01-01", end="1998-12-01"):
            s = int(np.datetime64(start).astype("datetime64[D]")
                    .astype(np.int64))
            e = int(np.datetime64(end).astype("datetime64[D]")
                    .astype(np.int64))
            return ints(s, e, n).astype(jnp.int64) * 86_400_000_000_000

        def codes(k, n):
            return ints(0, k, n, dtype=jnp.int32)

        return {
            "s_nationkey": ints(0, n_nation, n_supp),
            "s_acctbal": money(-999, 9999, n_supp),
            "c_name": codes(200, n_cust),
            "c_nationkey": ints(0, n_nation, n_cust),
            "c_mktsegment": codes(len(_SEGMENTS), n_cust),
            "c_acctbal": money(-999, 9999, n_cust),
            "p_name": codes(5, n_part),
            "p_type": codes(3, n_part),
            "p_retailprice": money(900, 2000, n_part),
            "o_custkey": ints(0, max(n_cust, 1), n_ord),
            "o_orderstatus": codes(len(_STATUS), n_ord),
            "o_totalprice": money(800, 500000, n_ord),
            "o_orderdate": dates(n_ord),
            "o_orderpriority": codes(3, n_ord),
            "l_orderkey": ints(0, max(n_ord, 1), n_li),
            "l_partkey": ints(0, max(n_part, 1), n_li),
            "l_suppkey": ints(0, n_supp, n_li),
            "l_quantity": ints(1, 51, n_li).astype(jnp.float64),
            "l_extendedprice": money(900, 105000, n_li),
            "l_discount": money(0.0, 0.1, n_li),
            "l_tax": money(0.0, 0.08, n_li),
            "l_returnflag": codes(len(_FLAGS), n_li),
            "l_shipmode": codes(4, n_li),
            "l_linestatus": codes(len(_STATUS), n_li),
            "l_shipdate": dates(n_li),
            "l_commitdate": dates(n_li),
            "l_receiptdate": dates(n_li),
        }

    g = jax.jit(_gen)(jax.random.PRNGKey(seed))

    def host_strings(strings):
        # key sets stay HOST-side (numpy buffers): the SPMD lowering
        # captures dictionary buffers as numpy constants, and a device
        # round-trip per buffer costs ~1.4 s over the axon tunnel
        enc = [s.encode("utf-8") for s in strings]
        offs = np.zeros(len(enc) + 1, np.int64)
        np.cumsum([len(b) for b in enc], out=offs[1:])
        chars = np.frombuffer(b"".join(enc), np.uint8).copy()
        return Column(dt.STRING, len(enc), data=chars, offsets=offs)

    def cat(name, choices):
        keys_col = host_strings(list(choices))
        return Column(dt.dictionary_dtype(dt.STRING), g[name].shape[0],
                      data=g[name], children=(keys_col,))

    def date_col(name):
        return Column(dt.dtype("datetime64[ns]"), g[name].shape[0],
                      data=g[name])

    # nation/region name columns are emitted dictionary-encoded (tiny
    # host-side code arrays): _register_source would otherwise re-run a
    # device dict_encode per query lowering
    nation = ct.DataFrame({
        "n_nationkey": np.arange(n_nation, dtype=np.int32),
        "n_name": Column(dt.dictionary_dtype(dt.STRING), n_nation,
                         data=np.arange(n_nation, dtype=np.int32),
                         children=(host_strings(
                             [f"NATION_{i:02d}" for i in range(n_nation)]),)),
        "n_regionkey": (np.arange(n_nation) % n_region).astype(np.int32),
    })
    region = ct.DataFrame({
        "r_regionkey": np.arange(n_region, dtype=np.int32),
        "r_name": Column(dt.dictionary_dtype(dt.STRING), n_region,
                         data=np.arange(n_region, dtype=np.int32),
                         children=(host_strings(_REGIONS),)),
    })
    supplier = ct.DataFrame({
        "s_suppkey": np.arange(n_supp, dtype=np.int32),
        "s_nationkey": g["s_nationkey"],
        "s_acctbal": g["s_acctbal"],
    })
    customer = ct.DataFrame({
        "c_custkey": np.arange(n_cust, dtype=np.int32),
        "c_name": cat("c_name", [f"Customer#{i:04d}" for i in range(200)]),
        "c_nationkey": g["c_nationkey"],
        "c_mktsegment": cat("c_mktsegment", _SEGMENTS),
        "c_acctbal": g["c_acctbal"],
    })
    part = ct.DataFrame({
        "p_partkey": np.arange(n_part, dtype=np.int32),
        "p_name": cat("p_name", ["green apple", "red truck", "blue sky",
                                 "green forest", "yellow sun"]),
        "p_type": cat("p_type", ["ECONOMY ANODIZED STEEL",
                                 "STANDARD BRUSHED COPPER",
                                 "PROMO BURNISHED NICKEL"]),
        "p_retailprice": g["p_retailprice"],
    })
    orders = ct.DataFrame({
        "o_orderkey": np.arange(n_ord, dtype=np.int32),
        "o_custkey": g["o_custkey"],
        "o_orderstatus": cat("o_orderstatus", _STATUS),
        "o_totalprice": g["o_totalprice"],
        "o_orderdate": date_col("o_orderdate"),
        "o_orderpriority": cat("o_orderpriority",
                               ["1-URGENT", "2-HIGH", "3-MEDIUM"]),
    })
    lineitem = ct.DataFrame({
        "l_orderkey": g["l_orderkey"],
        "l_partkey": g["l_partkey"],
        "l_suppkey": g["l_suppkey"],
        "l_quantity": g["l_quantity"],
        "l_extendedprice": g["l_extendedprice"],
        "l_discount": g["l_discount"],
        "l_tax": g["l_tax"],
        "l_returnflag": cat("l_returnflag", _FLAGS),
        "l_shipmode": cat("l_shipmode", ["MAIL", "SHIP", "AIR", "TRUCK"]),
        "l_linestatus": cat("l_linestatus", _STATUS),
        "l_shipdate": date_col("l_shipdate"),
        "l_commitdate": date_col("l_commitdate"),
        "l_receiptdate": date_col("l_receiptdate"),
    })
    return {
        "lineitem": lineitem, "orders": orders, "customer": customer,
        "supplier": supplier, "nation": nation, "region": region, "part": part,
    }


# ----------------------------------------------------------------------
# queries (LazyFrame plans; mesh=N runs the partitioned executor)
# ----------------------------------------------------------------------

def q1(tables, mesh=None):
    """Pricing summary report (reference: ndsh/q01.cpp)."""
    li = from_dataframe(tables["lineitem"])
    cutoff = np.datetime64("1998-09-02")
    plan = (
        li.filter(col("l_shipdate") <= lit(cutoff))
        .with_columns(
            (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).alias("disc_price"),
            (col("l_extendedprice") * (lit(1.0) - col("l_discount"))
             * (lit(1.0) + col("l_tax"))).alias("charge"),
        )
        .group_by("l_returnflag", "l_linestatus")
        .agg(
            col("l_quantity").sum().alias("sum_qty"),
            col("l_extendedprice").sum().alias("sum_base_price"),
            col("disc_price").sum().alias("sum_disc_price"),
            col("charge").sum().alias("sum_charge"),
            col("l_quantity").mean().alias("avg_qty"),
            col("l_extendedprice").mean().alias("avg_price"),
            col("l_discount").mean().alias("avg_disc"),
            col("l_quantity").count().alias("count_order"),
        )
        .sort(["l_returnflag", "l_linestatus"])
    )
    return plan.collect(mesh=mesh)


def q5(tables, mesh=None):
    """Local supplier volume (reference: ndsh/q05.cpp)."""
    li = from_dataframe(tables["lineitem"])
    o = from_dataframe(tables["orders"])
    c = from_dataframe(tables["customer"])
    s = from_dataframe(tables["supplier"])
    n = from_dataframe(tables["nation"])
    r = from_dataframe(tables["region"])
    lo = np.datetime64("1994-01-01")
    hi = np.datetime64("1995-01-01")
    plan = (
        r.filter(col("r_name") == lit("ASIA"))
        .join(n, left_on="r_regionkey", right_on="n_regionkey")
        .join(c, left_on="n_nationkey", right_on="c_nationkey")
        .join(o.filter((col("o_orderdate") >= lit(lo)) & (col("o_orderdate") < lit(hi))),
              left_on="c_custkey", right_on="o_custkey")
        .join(li, left_on="o_orderkey", right_on="l_orderkey")
        .join(s, left_on=["l_suppkey", "n_nationkey"], right_on=["s_suppkey", "s_nationkey"])
        .with_columns(
            (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).alias("volume")
        )
        .group_by("n_name")
        .agg(col("volume").sum().alias("revenue"))
        .sort("revenue", descending=True)
    )
    return plan.collect(mesh=mesh)


def q6(tables, mesh=None):
    """Forecast revenue change (reference: ndsh/q06.cpp)."""
    li = from_dataframe(tables["lineitem"])
    lo = np.datetime64("1994-01-01")
    hi = np.datetime64("1995-01-01")
    plan = (
        li.filter(
            (col("l_shipdate") >= lit(lo)) & (col("l_shipdate") < lit(hi))
            & (col("l_discount") >= lit(0.05)) & (col("l_discount") <= lit(0.07))
            & (col("l_quantity") < lit(24.0))
        )
        .with_columns((col("l_extendedprice") * col("l_discount")).alias("revenue"))
        .agg(col("revenue").sum().alias("revenue"))
    )
    return plan.collect(mesh=mesh)


def q9(tables, mesh=None):
    """Product type profit measure (reference: ndsh/q09.cpp)."""
    li = from_dataframe(tables["lineitem"])
    s = from_dataframe(tables["supplier"])
    n = from_dataframe(tables["nation"])
    p = from_dataframe(tables["part"])
    o = from_dataframe(tables["orders"])
    plan = (
        p.filter(col("p_name").is_in(["green apple", "green forest"]))
        .join(li, left_on="p_partkey", right_on="l_partkey")
        .join(s, left_on="l_suppkey", right_on="s_suppkey")
        .join(n, left_on="s_nationkey", right_on="n_nationkey")
        .join(o, left_on="l_orderkey", right_on="o_orderkey")
        .with_columns(
            (col("l_extendedprice") * (lit(1.0) - col("l_discount"))
             - lit(10.0) * col("l_quantity")).alias("amount"),
        )
        .group_by("n_name")
        .agg(col("amount").sum().alias("sum_profit"))
        .sort("n_name")
    )
    return plan.collect(mesh=mesh)


def q3(tables, mesh=None):
    """Shipping priority (reference: ndsh/q03; columns trimmed to the
    generated schema — revenue per order for BUILDING-segment customers)."""
    c = from_dataframe(tables["customer"])
    o = from_dataframe(tables["orders"])
    li = from_dataframe(tables["lineitem"])
    cutoff = np.datetime64("1995-03-15")
    plan = (
        c.filter(col("c_mktsegment") == lit("BUILDING"))
        .join(o, left_on="c_custkey", right_on="o_custkey")
        .filter(col("o_orderdate") < lit(cutoff))
        .join(li, left_on="o_orderkey", right_on="l_orderkey")
        .filter(col("l_shipdate") > lit(cutoff))
        .with_columns((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
                      .alias("revenue"))
        .group_by("o_orderkey", "o_orderdate")
        .agg(col("revenue").sum().alias("revenue"))
        .sort(["revenue", "o_orderdate"], descending=[True, False])
        .head(10)
    )
    return plan.collect(mesh=mesh)


def q10(tables, mesh=None):
    """Returned item reporting (reference: ndsh/q10; top 20 customers by
    lost revenue on returned lineitems)."""
    c = from_dataframe(tables["customer"])
    o = from_dataframe(tables["orders"])
    li = from_dataframe(tables["lineitem"])
    n = from_dataframe(tables["nation"])
    lo = np.datetime64("1993-10-01")
    hi = np.datetime64("1994-01-01")
    plan = (
        c.join(o, left_on="c_custkey", right_on="o_custkey")
        .filter((col("o_orderdate") >= lit(lo)) & (col("o_orderdate") < lit(hi)))
        .join(li, left_on="o_orderkey", right_on="l_orderkey")
        .filter(col("l_returnflag") == lit("R"))
        .join(n, left_on="c_nationkey", right_on="n_nationkey")
        .with_columns((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
                      .alias("revenue"))
        .group_by("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(col("revenue").sum().alias("revenue"))
        .sort(["revenue", "c_custkey"], descending=[True, False])
        .head(20)
    )
    return plan.collect(mesh=mesh)


def q4(tables, mesh=None):
    """Order priority checking (reference: ndsh/q04) — semi-join against
    late lineitems, count orders per priority."""
    o = from_dataframe(tables["orders"])
    li = from_dataframe(tables["lineitem"])
    lo = np.datetime64("1993-07-01")
    hi = np.datetime64("1993-10-01")
    late = li.filter(col("l_commitdate") < col("l_receiptdate"))
    plan = (
        o.filter((col("o_orderdate") >= lit(lo)) & (col("o_orderdate") < lit(hi)))
        .join(late, left_on="o_orderkey", right_on="l_orderkey", how="semi")
        .group_by("o_orderpriority")
        .agg(col("o_orderkey").count().alias("order_count"))
        .sort("o_orderpriority")
    )
    return plan.collect(mesh=mesh)


def q12(tables, mesh=None):
    """Shipping modes and order priority (reference: ndsh/q12) — CASE
    aggregation via when/then/otherwise."""
    o = from_dataframe(tables["orders"])
    li = from_dataframe(tables["lineitem"])
    lo = np.datetime64("1994-01-01")
    hi = np.datetime64("1995-01-01")
    high = (col("o_orderpriority") == lit("1-URGENT")) | (
        col("o_orderpriority") == lit("2-HIGH"))
    plan = (
        li.filter(col("l_shipmode").is_in(["MAIL", "SHIP"])
                  & (col("l_commitdate") < col("l_receiptdate"))
                  & (col("l_shipdate") < col("l_commitdate"))
                  & (col("l_receiptdate") >= lit(lo))
                  & (col("l_receiptdate") < lit(hi)))
        .join(o, left_on="l_orderkey", right_on="o_orderkey")
        .with_columns(
            when(high).then(lit(1)).otherwise(lit(0)).alias("high_line"),
            when(~high).then(lit(1)).otherwise(lit(0)).alias("low_line"),
        )
        .group_by("l_shipmode")
        .agg(col("high_line").sum().alias("high_line_count"),
             col("low_line").sum().alias("low_line_count"))
        .sort("l_shipmode")
    )
    return plan.collect(mesh=mesh)


def q14(tables, mesh=None):
    """Promotion effect (reference: ndsh/q14) — promo revenue share.
    (Generated p_type domain is finite, so the PROMO% prefix test reduces
    to one equality.)"""
    li = from_dataframe(tables["lineitem"])
    p = from_dataframe(tables["part"])
    lo = np.datetime64("1995-09-01")
    hi = np.datetime64("1995-10-01")
    plan = (
        li.filter((col("l_shipdate") >= lit(lo)) & (col("l_shipdate") < lit(hi)))
        .join(p, left_on="l_partkey", right_on="p_partkey")
        .with_columns((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
                      .alias("rev"))
        .with_columns(
            when(col("p_type") == lit("PROMO BURNISHED NICKEL"))
            .then(col("rev")).otherwise(lit(0.0)).alias("promo_rev"))
        .agg(col("promo_rev").sum().alias("promo"),
             col("rev").sum().alias("total"))
    )
    out = plan.collect(mesh=mesh)
    promo = float(out.to_pandas()["promo"][0])
    total = float(out.to_pandas()["total"][0])
    return 100.0 * promo / total if total else 0.0


def pandas_reference(tables, query: str):
    """Same query in pandas for differential validation."""
    import pandas as pd

    t = {k: v.to_pandas() for k, v in tables.items()}
    if query == "q1":
        li = t["lineitem"]
        li = li[li.l_shipdate <= pd.Timestamp("1998-09-02")].copy()
        li["disc_price"] = li.l_extendedprice * (1 - li.l_discount)
        li["charge"] = li.disc_price * (1 + li.l_tax)
        out = li.groupby(["l_returnflag", "l_linestatus"]).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            sum_charge=("charge", "sum"),
            avg_qty=("l_quantity", "mean"),
            avg_price=("l_extendedprice", "mean"),
            avg_disc=("l_discount", "mean"),
            count_order=("l_quantity", "count"),
        ).reset_index().sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
        return out
    if query == "q6":
        li = t["lineitem"]
        m = ((li.l_shipdate >= pd.Timestamp("1994-01-01"))
             & (li.l_shipdate < pd.Timestamp("1995-01-01"))
             & (li.l_discount >= 0.05) & (li.l_discount <= 0.07)
             & (li.l_quantity < 24))
        return float((li[m].l_extendedprice * li[m].l_discount).sum())
    if query == "q5":
        r = t["region"]; n = t["nation"]; c = t["customer"]; o = t["orders"]
        li = t["lineitem"]; s = t["supplier"]
        r = r[r.r_name == "ASIA"]
        df = r.merge(n, left_on="r_regionkey", right_on="n_regionkey")
        df = df.merge(c, left_on="n_nationkey", right_on="c_nationkey")
        o = o[(o.o_orderdate >= pd.Timestamp("1994-01-01")) & (o.o_orderdate < pd.Timestamp("1995-01-01"))]
        df = df.merge(o, left_on="c_custkey", right_on="o_custkey")
        df = df.merge(li, left_on="o_orderkey", right_on="l_orderkey")
        df = df.merge(s, left_on=["l_suppkey", "n_nationkey"], right_on=["s_suppkey", "s_nationkey"])
        df["volume"] = df.l_extendedprice * (1 - df.l_discount)
        return (df.groupby("n_name").agg(revenue=("volume", "sum"))
                .reset_index().sort_values("revenue", ascending=False).reset_index(drop=True))
    if query == "q9":
        p = t["part"]; li = t["lineitem"]; s = t["supplier"]; n = t["nation"]; o = t["orders"]
        p = p[p.p_name.isin(["green apple", "green forest"])]
        df = p.merge(li, left_on="p_partkey", right_on="l_partkey")
        df = df.merge(s, left_on="l_suppkey", right_on="s_suppkey")
        df = df.merge(n, left_on="s_nationkey", right_on="n_nationkey")
        df = df.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        df["amount"] = df.l_extendedprice * (1 - df.l_discount) - 10.0 * df.l_quantity
        return (df.groupby("n_name").agg(sum_profit=("amount", "sum"))
                .reset_index().sort_values("n_name").reset_index(drop=True))
    if query == "q4":
        o = t["orders"]; li = t["lineitem"]
        lo, hi = pd.Timestamp("1993-07-01"), pd.Timestamp("1993-10-01")
        late = li[li.l_commitdate < li.l_receiptdate]
        sel = o[(o.o_orderdate >= lo) & (o.o_orderdate < hi)]
        sel = sel[sel.o_orderkey.isin(late.l_orderkey)]
        return (sel.groupby("o_orderpriority")
                .agg(order_count=("o_orderkey", "count")).reset_index()
                .sort_values("o_orderpriority").reset_index(drop=True))
    if query == "q12":
        o = t["orders"]; li = t["lineitem"]
        lo, hi = pd.Timestamp("1994-01-01"), pd.Timestamp("1995-01-01")
        m = (li.l_shipmode.isin(["MAIL", "SHIP"])
             & (li.l_commitdate < li.l_receiptdate)
             & (li.l_shipdate < li.l_commitdate)
             & (li.l_receiptdate >= lo) & (li.l_receiptdate < hi))
        df = li[m].merge(o, left_on="l_orderkey", right_on="o_orderkey")
        high = df.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
        df = df.assign(high_line=high.astype(int), low_line=(~high).astype(int))
        return (df.groupby("l_shipmode")
                .agg(high_line_count=("high_line", "sum"),
                     low_line_count=("low_line", "sum")).reset_index()
                .sort_values("l_shipmode").reset_index(drop=True))
    if query == "q14":
        li = t["lineitem"]; p = t["part"]
        lo, hi = pd.Timestamp("1995-09-01"), pd.Timestamp("1995-10-01")
        df = li[(li.l_shipdate >= lo) & (li.l_shipdate < hi)].merge(
            p, left_on="l_partkey", right_on="p_partkey")
        rev = df.l_extendedprice * (1 - df.l_discount)
        promo = rev[df.p_type == "PROMO BURNISHED NICKEL"].sum()
        return 100.0 * promo / rev.sum() if rev.sum() else 0.0
    if query == "q3":
        c = t["customer"]; o = t["orders"]; li = t["lineitem"]
        cutoff = pd.Timestamp("1995-03-15")
        df = c[c.c_mktsegment == "BUILDING"].merge(
            o[o.o_orderdate < cutoff], left_on="c_custkey", right_on="o_custkey")
        df = df.merge(li[li.l_shipdate > cutoff],
                      left_on="o_orderkey", right_on="l_orderkey")
        df["revenue"] = df.l_extendedprice * (1 - df.l_discount)
        out = (df.groupby(["o_orderkey", "o_orderdate"])
               .agg(revenue=("revenue", "sum")).reset_index()
               .sort_values(["revenue", "o_orderdate"], ascending=[False, True])
               .head(10).reset_index(drop=True))
        return out[["o_orderkey", "o_orderdate", "revenue"]]
    if query == "q10":
        c = t["customer"]; o = t["orders"]; li = t["lineitem"]; n = t["nation"]
        lo, hi = pd.Timestamp("1993-10-01"), pd.Timestamp("1994-01-01")
        df = c.merge(o[(o.o_orderdate >= lo) & (o.o_orderdate < hi)],
                     left_on="c_custkey", right_on="o_custkey")
        df = df.merge(li[li.l_returnflag == "R"],
                      left_on="o_orderkey", right_on="l_orderkey")
        df = df.merge(n, left_on="c_nationkey", right_on="n_nationkey")
        df["revenue"] = df.l_extendedprice * (1 - df.l_discount)
        out = (df.groupby(["c_custkey", "c_name", "c_acctbal", "n_name"])
               .agg(revenue=("revenue", "sum")).reset_index()
               .sort_values(["revenue", "c_custkey"], ascending=[False, True])
               .head(20).reset_index(drop=True))
        return out
    raise ValueError(query)
