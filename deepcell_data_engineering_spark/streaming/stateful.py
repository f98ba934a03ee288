"""Stateful streaming operators (applyInPandasWithState).

The reference's frame-to-frame label propagation (relabel.py:227-276) is a
keyed stateful fold: state = the previous frame's relabeled mask per fov.
``stateful_frame_relabel`` is its streaming form — frames arrive on a
stream, ids propagate incrementally, state lives in the state store.

``stateful_user_stats`` exercises the same primitive on the ``events``
testdata: per-user running counts/sums that survive across micro-batches.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FRAME_OUT_SCHEMA = StructType(
    [
        StructField("fov", StringType()),
        StructField("stack", IntegerType()),
        StructField("height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("y", BinaryType()),
    ]
)

_FRAME_STATE_SCHEMA = StructType(
    [
        StructField("prev", BinaryType()),
        StructField("height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("next_stack", IntegerType()),
    ]
)


def _make_relabel_frames_fold(start_val: int, threshold: float):
    def _relabel_frames_fold(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        from deepcell_data_engineering_spark.operators.relabel import (
            predict_next_frame,
            relabel_sequential_np,
        )
        from deepcell_data_engineering_spark.sources.codecs import (
            decode_y,
            encode_y,
        )

        if state.exists:
            prev_bytes, h, w, next_stack = state.get
            prev = decode_y(prev_bytes, h, w)
        else:
            prev, next_stack = None, 0

        out = []
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("stack")
        for _, r in rows.iterrows():
            h, w = int(r["height"]), int(r["width"])
            y = decode_y(r["y"], h, w)
            if prev is None:
                cur = relabel_sequential_np(y, start_val)
            else:
                cur = predict_next_frame(prev, y, threshold)
            out.append(
                {
                    "fov": r["fov"],
                    "stack": int(r["stack"]),
                    "height": h,
                    "width": w,
                    "y": encode_y(cur),
                }
            )
            prev = cur
            next_stack = int(r["stack"]) + 1

        state.update(
            (encode_y(prev), int(prev.shape[0]), int(prev.shape[1]), next_stack)
        )
        yield pd.DataFrame(out, columns=[f.name for f in FRAME_OUT_SCHEMA.fields])

    return _relabel_frames_fold


def stateful_frame_relabel(
    frames: DataFrame, start_val: int = 1, threshold: float = 0.1
) -> DataFrame:
    """Streaming L4: propagate cell ids across arriving frames per fov.
    Input needs (fov, stack, height, width, y); frames of one fov must
    arrive stack-ordered across batches (in-batch order is handled).
    Same fold as operators/relabel.py:predict_relationships, with the
    previous frame carried in the state store instead of a local — the
    scale path relabel_data dispatches to for streaming input."""
    return frames.groupBy("fov").applyInPandasWithState(
        _make_relabel_frames_fold(start_val, threshold),
        outputStructType=FRAME_OUT_SCHEMA,
        stateStructType=_FRAME_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


USER_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_USER_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _user_stats_fold(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n, "total_value": round(total, 2)}]
    )


def stateful_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) carried in the state store."""
    return events.groupBy("user_id").applyInPandasWithState(
        _user_stats_fold,
        outputStructType=USER_STATS_SCHEMA,
        stateStructType=_USER_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def tws_available() -> bool:
    """transformWithState's state server speaks protobuf; without the
    google.protobuf runtime the driver worker crashes at pre-init. Gate
    mirrors the S10 image-codec posture: real plumbing, honest check."""
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def stateful_user_stats_tws(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) on the Spark 4 transformWithState
    API — the successor of applyInPandasWithState (multiple named state
    variables, optional TTL, timers). Same semantics as
    stateful_user_stats; the test pins output parity between the two so
    a migration to the new API is a drop-in. Requires the protobuf
    runtime (see tws_available); the applyInPandasWithState twin is the
    dependency-free path."""
    if not tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs the google.protobuf runtime, "
            "not present in this environment — use stateful_user_stats "
            "(applyInPandasWithState) instead"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Processor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n BIGINT, total DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            if self._agg.exists():
                n, total = self._agg.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._agg.update((n, total))
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "n_events": n,
                        "total_value": round(total, 2),
                    }
                ]
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        Processor(),
        outputStructType=USER_STATS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
