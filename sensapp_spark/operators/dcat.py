"""DCAT JSON-LD catalog builders (operators C3/C4 output format).

Shapes mirror reference src/ingestors/http/crud.rs:258-343 (metrics
catalog) and crud.rs:395-479 (series catalog): same @context, ids,
keywords, and distribution links.
"""

from __future__ import annotations

import urllib.parse

from pyspark.sql import DataFrame


def _type_keyword(sensor_type: str) -> str:
    return sensor_type.lower()


def metrics_catalog(metrics_df: DataFrame) -> dict:
    """``metrics_summary`` frame → DCAT catalog document."""
    datasets = []
    for m in metrics_df.collect():
        label_keys = list(m.label_keys or [])
        keywords = ["metric", "aggregated", "time-series",
                    _type_keyword(m.type)] + label_keys
        dims = ", ".join(label_keys) if label_keys else "none"
        dataset = {
            "@type": "dcat:Dataset",
            "@id": m.name,
            "dct:identifier": f"metric:{m.name}",
            "dct:title": m.name,
            "dct:description": (
                f"Aggregated metric '{m.name}' containing {m.series_count} "
                f"time series with dimensions: {dims}"
            ),
            "dcat:keyword": keywords,
            "dct:format": "DCAT",
            "dcat:mediaType": "application/json",
            "sensor:type": m.type,
            "sensor:seriesCount": m.series_count,
            "sensor:labelDimensions": label_keys,
            "dct:temporal": {"@type": "dct:PeriodOfTime"},
            "dcat:distribution": [
                {
                    "@type": "dcat:Distribution",
                    "dcat:accessURL": (
                        f"/series?metric={urllib.parse.quote(m.name, safe='')}"
                    ),
                    "dcat:mediaType": "application/json",
                    "dct:format": "DCAT Series Catalog",
                    "dct:description": (
                        f"All {m.series_count} time series for this metric"
                    ),
                }
            ],
        }
        if m.unit:
            dataset["sensor:unit"] = m.unit
        datasets.append(dataset)
    return {
        "@context": {
            "dcat": "http://www.w3.org/ns/dcat#",
            "dct": "http://purl.org/dc/terms/",
            "foaf": "http://xmlns.com/foaf/0.1/",
            "sensor": "http://sensapp.io/ns/sensor#",
        },
        "@type": "dcat:Catalog",
        "@id": "sensapp_metrics_catalog",
        "dct:title": "SensApp Metrics Catalog",
        "dct:description": "Catalog of aggregated metrics available in SensApp platform",
        "dct:publisher": {"@type": "foaf:Organization", "foaf:name": "SensApp"},
        "dcat:dataset": datasets,
    }


def series_catalog(series_df: DataFrame) -> dict:
    """Sensors frame (with ``series`` Prometheus-style id column) → DCAT
    catalog document."""
    datasets = []
    for s in series_df.collect():
        labels = dict(s.labels or {})
        keywords = ["sensor", "time-series", _type_keyword(s.type)] + list(labels)
        prometheus_id = s.series if labels else s.name
        dataset = {
            "@type": "dcat:Dataset",
            "@id": prometheus_id,
            "dct:identifier": s.sensor_id,
            "dct:title": s.name,
            "dct:description": f"Sensor data from {s.name} ({s.type})",
            "dcat:keyword": keywords,
            "dct:format": "JSON",
            "dcat:mediaType": "application/json",
            "sensor:type": s.type,
            "sensor:labels": [{k: v} for k, v in labels.items()],
            "dct:temporal": {"@type": "dct:PeriodOfTime"},
            "dcat:distribution": [
                {
                    "@type": "dcat:Distribution",
                    "dcat:downloadURL": f"/series/{s.sensor_id}?format=senml",
                    "dcat:mediaType": "application/senml+json",
                    "dct:format": "SenML JSON",
                },
                {
                    "@type": "dcat:Distribution",
                    "dcat:downloadURL": f"/series/{s.sensor_id}?format=csv",
                    "dcat:mediaType": "text/csv",
                    "dct:format": "CSV",
                },
                {
                    "@type": "dcat:Distribution",
                    "dcat:downloadURL": f"/series/{s.sensor_id}?format=jsonl",
                    "dcat:mediaType": "application/x-ndjson",
                    "dct:format": "JSON Lines",
                },
            ],
        }
        if s.unit:
            dataset["sensor:unit"] = s.unit
        datasets.append(dataset)
    return {
        "@context": {
            "dcat": "http://www.w3.org/ns/dcat#",
            "dct": "http://purl.org/dc/terms/",
            "foaf": "http://xmlns.com/foaf/0.1/",
        },
        "@type": "dcat:Catalog",
        "@id": "sensapp_series_catalog",
        "dct:title": "SensApp Series Catalog",
        "dct:description": "Catalog of available time series in SensApp platform",
        "dct:publisher": {"@type": "foaf:Organization", "foaf:name": "SensApp"},
        "dcat:dataset": datasets,
    }
