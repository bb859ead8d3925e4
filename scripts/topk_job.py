"""spark-submit entry point: distributed epsilon-DP heavy hitters.

Mirrors `python -m mgspark spark ...` but in the --py-files packaging
required by the north_star: mgspark ships as a zip, the driver only
needs this file.
"""

import sys

from pyspark.sql import SparkSession


def main() -> None:
    k = int(sys.argv[1])
    epsilon = float(sys.argv[2])
    delta = float(sys.argv[3])
    path, column = sys.argv[4], sys.argv[5]
    checkpoint = sys.argv[6] if len(sys.argv) > 6 else None

    from mgspark import dp
    from mgspark.aggregate import decode_keys, encode_tokens, mg_sketch

    spark = SparkSession.builder.appName("mgspark-topk").getOrCreate()
    df = spark.read.parquet(path)
    encoded = encode_tokens(df, column)
    state = mg_sketch(encoded, "key", k, checkpoint_dir=checkpoint)
    if delta > 0:
        released = dp.privatize_merged(state.to_dict(), k, epsilon, delta)
    else:
        released = dp.purely_privatize_merged(state.to_dict(), k, epsilon, 1 << 62)
    mapping = decode_keys(df.withColumnRenamed(column, "token").select("token"), "token", list(released))
    print(f"n={state.n} d={state.d}")
    for key, cnt in released.items():
        print(f"{mapping.get(key, key)}\t{cnt}")
    spark.stop()


if __name__ == "__main__":
    main()
