"""Command-line interface mirroring the reference CLI contract.

The reference (pmg.py:496-646) exposes three positional modes; a user of
the reference can run the same invocations against this package:

    python -m mgspark <k> <eps> <delta> <stream file> [output sketch file]
    python -m mgspark <k> <eps> 0 <universe size> <stream file> [output file]
    python -m mgspark merge <k> <eps> <delta> <sketch.json> [...]
    python -m mgspark merge <k> <eps> 0 <universe size> <sketch.json> [...]
    python -m mgspark userlevel <k> <eps> <delta> <user element count> <stream file>
    python -m mgspark userlevel <k> <eps> 0 <user element count> <universe size> <stream file>

plus a Spark job mode for distributed sketches over parquet tables:

    python -m mgspark spark <k> <eps> <delta> <parquet path> <column> [checkpoint dir]
    python -m mgspark spark <k> <eps> 0 <universe size | auto> <parquet path> <column> [checkpoint dir]

Stream files hold one integer per line (README.md:17); sketch files are
JSON objects ``{"key": counter}`` (pmg.py:222-225).
"""

from __future__ import annotations

import json
import sys


from mgspark import dp
from mgspark.kernel import MGState, mg_merge_dicts, mg_reference

USAGE = """Differentially Private Misra-Gries on PySpark
Usage:
  Create an (epsilon, delta)-private sketch:
    python -m mgspark <sketch size> <epsilon> <delta> <stream file> [output sketch file]
  Create an (epsilon, 0)-private sketch:
    python -m mgspark <sketch size> <epsilon> 0 <universe size> <stream file> [output sketch file]
  Merge sketches with (epsilon, delta)-privacy:
    python -m mgspark merge <sketch size> <epsilon> <delta> <sketch file> [<sketch file> ...]
  Merge sketches with (epsilon, 0)-privacy:
    python -m mgspark merge <sketch size> <epsilon> 0 <universe size> <sketch file> [<sketch file> ...]
  Create a user-level (epsilon, delta)-private sketch:
    python -m mgspark userlevel <sketch size> <epsilon> <delta> <user element count> <stream file>
  Create a user-level (epsilon, 0)-private sketch:
    python -m mgspark userlevel <sketch size> <epsilon> 0 <user element count> <universe size> <stream file>
  Distributed sketch of a parquet or catalog-table column (Spark job):
    python -m mgspark spark <sketch size> <epsilon> <delta> <parquet path | table:NAME | iceberg:CAT.DB.TBL> <column> [checkpoint dir]
  Distributed sketch with (epsilon, 0)-privacy (universe: an integer for a
  non-negative integral column, or `auto` to derive a dictionary universe
  from the column's distinct values):
    python -m mgspark spark <sketch size> <epsilon> 0 <universe size | auto> <parquet path | table:NAME | iceberg:CAT.DB.TBL> <column> [checkpoint dir]"""


def _build_from_file(path: str, k: int) -> MGState:
    """Stream a one-int-per-line file through the *sequential* kernel.

    The CLI is the drop-in surface of the reference's single-stream mode,
    so it must reproduce its exact output — including retained
    zero-counter keys (pmg.py:31-32), which the batch/merge formulation
    legitimately prunes.  Distributed jobs (the ``spark`` mode) use the
    vectorized kernel instead.
    """
    with open(path, encoding="utf8") as stream:
        sketch, n, d = mg_reference(map(int, stream), k)
    return MGState.from_dict(sketch, k, n=n, d=d)


def _load_sketch(path: str) -> dict[int, int]:
    with open(path, encoding="utf8") as f:
        return {int(key): counter for key, counter in json.load(f).items()}


def _dump_sketch(sketch: dict[int, int], path: str) -> None:
    with open(path, "w", encoding="utf8") as f:
        json.dump({str(key): counter for key, counter in sketch.items()}, f)


def create_sketch(argv: list[str]) -> None:
    k = int(argv[1])
    epsilon = float(argv[2])
    delta = float(argv[3])
    if delta > 0:
        file, out_idx = argv[4], 5
        universe_size = None
    else:
        universe_size, file, out_idx = int(argv[4]), argv[5], 6
    state = _build_from_file(file, k)
    sketch = state.to_dict()
    if delta > 0:
        private = dp.privatize_misra_gries(sketch, epsilon, delta)
    else:
        private = dp.purely_privatize_misra_gries(
            sketch, k, epsilon, universe_size, state.n, state.d
        )
    print("Sketch        :", sketch)
    print("Private sketch:", private)
    if len(argv) > out_idx:
        _dump_sketch(sketch, argv[out_idx])


def merge_sketches(argv: list[str]) -> None:
    k = int(argv[2])
    epsilon = float(argv[3])
    delta = float(argv[4])
    if delta > 0:
        files = argv[5:]
        universe_size = None
    else:
        universe_size, files = int(argv[5]), argv[6:]
    merged = mg_merge_dicts([_load_sketch(f) for f in files], k)
    if delta > 0:
        private = dp.privatize_merged(merged, k, epsilon, delta)
    else:
        private = dp.purely_privatize_merged(merged, k, epsilon, universe_size)
    print("Merged        :", merged)
    print("Private merged:", private)


def create_user_level_sketch(argv: list[str]) -> None:
    k = int(argv[2])
    epsilon = float(argv[3])
    delta = float(argv[4])
    m = int(argv[5])
    if delta > 0:
        file = argv[6]
        universe_size = None
    else:
        universe_size, file = int(argv[6]), argv[7]
    state = _build_from_file(file, k)
    sketch = state.to_dict()
    if delta > 0:
        private = dp.privatize_user_level(sketch, epsilon, delta, m)
    else:
        private = dp.purely_privatize_user_level(
            sketch, k, epsilon, universe_size, state.n, state.d, m
        )
    print("Sketch                   :", sketch)
    print("User-level private sketch:", private)


def spark_sketch(argv: list[str]) -> None:
    """Distributed sketch + central DP release over a parquet/table column.

    Pure DP (delta=0) mirrors the reference's finite-universe contract
    (pmg.py:143-204): the mechanism needs keys in a meaningful ``[0, U)``
    domain, so the hashed 2^62 key space is NOT a valid default (its
    threshold ``ceil(-s*ln((a+1)k/U)/eps)`` is astronomically large and
    every release would be silently empty).  Instead the universe is
    either an explicit integer over a non-negative integral column, or
    ``auto``: the column's distinct values are dictionary-encoded to
    dense ids (like ``q_mg_pure_dp_doc_lang``), the universe is the
    dictionary size (clamped above the sketch size — a larger universe
    only raises the threshold, the privacy-safe direction), and released
    keys decode back through the dictionary (fresh upgraded universe
    keys print as ``u<id>``).
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    from mgspark.aggregate import encode_tokens, mg_sketch  # noqa: PLC0415
    from mgspark.session import get_spark  # noqa: PLC0415

    k = int(argv[2])
    epsilon = float(argv[3])
    delta = float(argv[4])
    if delta > 0:
        if len(argv) < 7:
            raise ValueError(
                "spark mode needs <path|table:NAME|iceberg:CAT.DB.TBL> <column>"
            )
        universe_arg = None
        path, column = argv[5], argv[6]
        checkpoint = argv[7] if len(argv) > 7 else None
    else:
        if len(argv) < 8:
            raise ValueError(
                "pure-DP spark mode needs <universe size | auto> "
                "<path|table:NAME|iceberg:CAT.DB.TBL> <column> "
                "(the universe argument is required when delta == 0)"
            )
        universe_arg, path, column = argv[5], argv[6], argv[7]
        checkpoint = argv[8] if len(argv) > 8 else None
    spark = get_spark("mgspark-cli")
    # Unified source dispatch: `iceberg:CAT.DB.TBL` (DataSource V2, with
    # time-travel for resumable lineage), `table:NAME` (session catalog),
    # or a bare parquet path — see mgspark.sources.load_table.
    from mgspark.sources import load_table  # noqa: PLC0415

    df = load_table(spark, path, columns=[column])

    decode = None
    decode_dict_df = None
    if delta > 0:
        encoded = encode_tokens(df, column)
    elif universe_arg == "auto":
        # Dictionary universe: dense ids [0, U) over the distinct values
        # (nulls skipped).  Small dictionaries use the broadcast-join
        # driver encoding (shared helper with the driver contract's
        # pure-DP query); above its cap the dictionary STAYS a
        # distributed DataFrame (range-partitioned dense rank, VERDICT
        # r3 task #6) — U comes from a distributed count and only the
        # <= k released keys are ever decoded driver-side.
        from mgspark.aggregate import (  # noqa: PLC0415
            dictionary_encode,
            dictionary_encode_distributed,
        )

        try:
            encoded, inverse, dict_size = dictionary_encode(df, column)
            decode = lambda key: inverse.get(key, f"u{key}")  # noqa: E731
        except ValueError as ex:
            if "distinct values" not in str(ex):
                raise  # only the over-cap signal reroutes; real errors surface
            encoded, decode_dict_df, dict_size = dictionary_encode_distributed(
                df, column
            )
        encoded = encoded.select("key")
        # A larger universe only raises the release threshold — the
        # privacy-safe direction — so clamp above the sketch size.
        universe_size = max(dict_size, k) + 1
    else:
        universe_size = int(universe_arg)
        dtype = dict(df.dtypes)[column]
        if dtype not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"pure DP with an explicit universe needs a non-negative "
                f"integral column in [0, {universe_size}); column "
                f"{column!r} is {dtype} — use `auto` to derive a "
                "dictionary universe instead"
            )
        # The mechanism's [0, U) domain must actually hold — out-of-range
        # keys silently void the epsilon-DP guarantee (the threshold is
        # computed for a universe the data does not live in).
        bounds = df.agg(
            F.min(column).alias("lo"), F.max(column).alias("hi")
        ).first()
        if bounds["lo"] is not None and (
            int(bounds["lo"]) < 0 or int(bounds["hi"]) >= universe_size
        ):
            raise ValueError(
                f"column {column!r} has values in "
                f"[{bounds['lo']}, {bounds['hi']}] outside the declared "
                f"universe [0, {universe_size}); pass a correct universe "
                "or use `auto`"
            )
        encoded = encode_tokens(df, column)
    state = mg_sketch(encoded, "key", k, checkpoint_dir=checkpoint)
    sketch = state.to_dict()
    if delta > 0:
        private = dp.privatize_merged(sketch, k, epsilon, delta)
    else:
        private = dp.purely_privatize_merged(sketch, k, epsilon, universe_size)
    if decode_dict_df is not None:
        # Distributed dictionary: decode only the released/sketched keys
        # (O(k) rows) through a broadcast-filtered collect.
        from mgspark.aggregate import decode_dictionary_keys  # noqa: PLC0415

        mapping = decode_dictionary_keys(
            decode_dict_df, set(sketch) | set(private)
        )
        decode = lambda key: mapping.get(key, f"u{key}")  # noqa: E731
    if decode is not None:
        sketch = {decode(key): counter for key, counter in sketch.items()}
        private = {decode(key): counter for key, counter in private.items()}
    print("Sketch        :", sketch)
    print("N, d          :", state.n, state.d)
    print("Private sketch:", private)


def main(argv: list[str] | None = None) -> None:
    argv = list(sys.argv if argv is None else argv)
    if len(argv) < 5:
        print(USAGE)
        return
    match argv[1]:
        case "merge":
            merge_sketches(argv)
        case "userlevel":
            create_user_level_sketch(argv)
        case "spark":
            spark_sketch(argv)
        case _:
            create_sketch(argv)


if __name__ == "__main__":
    main()
