"""Deterministic flight-style fixture matching FIXTURES.md §A1/§A2.

Synthesized from the documented schema/value ranges (NOT copied from
the reference's CSV).  The label has a learnable structure —
``depDelayMins`` is driven by dofW / scheduleDepTime / carrier — so
the trained tree makes meaningful predictions on the 6 probe rows.
"""

from __future__ import annotations

import random

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

AIRPORTS = [
    (10397, "ATL"),
    (11292, "DEN"),
    (12478, "JFK"),
    (12892, "LAX"),
    (13296, "MHT"),
    (13485, "MSN"),
    (13930, "ORD"),
]

FLIGHT_SCHEMA = StructType(
    [
        StructField("dofM", IntegerType(), True),
        StructField("dofW", IntegerType(), True),
        StructField("carrier", DoubleType(), True),
        StructField("tailNum", StringType(), True),
        StructField("flightNum", IntegerType(), True),
        StructField("originId", IntegerType(), True),
        StructField("origin", StringType(), True),
        StructField("destId", IntegerType(), True),
        StructField("dest", StringType(), True),
        StructField("scheduleDepTime", DoubleType(), True),
        StructField("deptime", DoubleType(), True),
        StructField("depDelayMins", DoubleType(), True),
        StructField("scheduledArrTime", DoubleType(), True),
        StructField("arrTime", DoubleType(), True),
        StructField("arrDelay", DoubleType(), True),
        StructField("elapsedTime", DoubleType(), True),
        StructField("distance", IntegerType(), True),
    ]
)

TRAIN_SCHEMA = StructType(FLIGHT_SCHEMA.fields + [StructField("delayed", DoubleType(), True)])

# The 6 prediction-input rows from FIXTURES.md §A2 (data spec, not code).
PREDICT_ROWS = [
    (3, 5, 1.0, "N327AA", 1, 12478, "JFK", 12892, "LAX", 900.0, 1005.0, 65.0, 1225.0, 1324.0, 59.0, 385.0, 2475),
    (24, 5, 2.0, "N0EGMQ", 3419, 10397, "ATL", 12953, "LGA", 1150.0, 1229.0, 39.0, 1359.0, 1448.0, 49.0, 129.0, 762),
    (3, 5, 3.0, "N14991", 6159, 13930, "ORD", 13198, "MCI", 2030.0, 2118.0, 48.0, 2205.0, 2321.0, 76.0, 95.0, 403),
    (28, 2, 1.0, "N355AA", 2407, 12892, "LAX", 11298, "DFW", 1025.0, 1023.0, 0.0, 1530.0, 1523.0, 0.0, 185.0, 1235),
    (1, 3, 4.0, "N919DE", 1908, 13930, "ORD", 11433, "DTW", 1641.0, 1902.0, 141.0, 1905.0, 2117.0, 132.0, 84.0, 235),
    (1, 3, 4.0, "N933DN", 1791, 10397, "ATL", 15376, "TUS", 1855.0, 2014.0, 79.0, 2108.0, 2159.0, 51.0, 253.0, 1541),
]


def make_train_rows(n: int = 106, seed: int = 7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        dofM = rng.randrange(0, 31)
        dofW = rng.randrange(0, 7)
        carrier = float(rng.choice([1, 2, 3, 4]))
        origin_id, origin = rng.choice(AIRPORTS)
        dest_id, dest = rng.choice(AIRPORTS)
        sched_dep = float(rng.randrange(6, 23) * 100 + rng.randrange(0, 60))
        elapsed = float(rng.randrange(60, 400))
        distance = rng.randrange(200, 2500)
        # Learnable delay structure: evenings, Fridays and carrier 4
        # are delay-prone.
        delay = (
            max(0.0, rng.gauss(10, 15))
            + (35 if sched_dep >= 1600 else 0)
            + (25 if dofW == 5 else 0)
            + (20 if carrier == 4.0 else 0)
        )
        delay = round(delay, 1)
        dep = sched_dep + delay
        sched_arr = sched_dep + elapsed
        arr_delay = max(0.0, delay + rng.gauss(0, 10))
        rows.append(
            (
                dofM, dofW, carrier, f"N{100+i}XX", rng.randrange(1, 9999),
                origin_id, origin, dest_id, dest, sched_dep, dep, delay,
                sched_arr, sched_arr + arr_delay, round(arr_delay, 1),
                elapsed, distance,
                1.0 if delay > 40 else 0.0,  # label rule (O14)
            )
        )
    return rows


def flight_train_df(spark: SparkSession):
    return spark.createDataFrame(make_train_rows(), schema=TRAIN_SCHEMA)


def flight_predict_df(spark: SparkSession):
    return spark.createDataFrame(PREDICT_ROWS, schema=FLIGHT_SCHEMA)


TRAINER_FEATURES = "dofM,dofW,carrier,originId,destId,scheduleDepTime,scheduledArrTime,elapsedTime"
PREDICTOR_EXCLUDES = "tailNum,flightNum,origin,dest,deptime,depDelayMins,arrTime,arrDelay,distance"
