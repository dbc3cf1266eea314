"""Query modules — importing each one populates the registry."""

from __future__ import annotations

import importlib

_MODULES = (
    "scan",
    "relational",
    "joins",
    "aggregation",
    "windows",
    "setops",
    "functions",
    "udf",
    "streaming_batch",
    "llm",
    "pipeline",
    "corpus",
    "datapipe",
    "datapipe2",
    "datapipe3",
    "analytics",
    "retrieval",
    "tpch",
    "datapipe4",
    "tpch2",
    "datapipe5",
    "ssb",
    "datapipe6",
    "datapipe7",
    "datapipe8",
    "datapipe9",
    "datapipe10",
    "datapipe11",
    "datapipe12",
    "datapipe13",
    "datapipe14",
    "datapipe15",
    "datapipe16",
    "datapipe17",
    "datapipe18",
    "datapipe19",
    "datapipe20",
    "datapipe21",
    "datapipe22",
    "datapipe23",
    "datapipe24",
    "datapipe25",
    "datapipe26",
    "datapipe27",
    "datapipe28",
    "datapipe29",
    "datapipe30",
    "datapipe31",
    "datapipe32",
    "datapipe33",
    "datapipe34",
    "datapipe35",
    "datapipe36",
    "datapipe37",
    "datapipe38",
    "datapipe39",
    "datapipe40",
    "datapipe41",
    "datapipe42",
    "datapipe43",
    "datapipe44",
    "datapipe45",
    "datapipe46",
    "datapipe47",
    "datapipe48",
    "datapipe49",
    "datapipe50",
    "datapipe51",
    "datapipe52",
    "datapipe53",
    "datapipe54",
    "datapipe55",
    "datapipe56",
    "datapipe57",
    "datapipe58",
    "datapipe59",
    "datapipe60",
    "datapipe61",
    "datapipe62",
)

_loaded = False


def load() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        importlib.import_module(f"cassowary_spark.queries.{mod}")
    _loaded = True
