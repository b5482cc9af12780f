"""Canonical GeoJSON document serializer (SURVEY.md §4 custom-work #3).

The reference emits jsonj objects in insertion order: id, title, geometry,
categories, address?, links? (OsmPostProcessor.java:128-131, 332-343). We
pin exactly that key order. Number formatting note: Java's Double.toString
and Python repr agree on typical OSM coordinates (shortest round-trip);
golden tests compare parsed JSON, byte-parity asserted on fixture coords.

Implemented as an Arrow-batched pandas UDF (string building is not
expressible as built-in columns with stable float formatting).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _feature_doc(
    fid: str,
    title: str,
    geom_type: str,
    coords,
    categories,
    address,
    links,
) -> str:
    doc: dict = {
        "id": fid,
        "title": title,
        "geometry": {"type": geom_type, "coordinates": coords},
        "categories": {"osm": list(categories)},
    }
    if address:
        doc["address"] = dict(address)
    if links is not None and len(links):
        doc["links"] = [{"href": h["href"] if isinstance(h, dict) else h} for h in links]
    return json.dumps(doc, ensure_ascii=False, separators=(",", ":"))


@F.pandas_udf(T.StringType())
def geojson_doc(
    fid: pd.Series, title: pd.Series, geom_type: pd.Series, coords_json: pd.Series,
    categories: pd.Series, address: pd.Series, links: pd.Series,
) -> pd.Series:
    out = []
    for i in range(len(fid)):
        coords = json.loads(coords_json.iloc[i])
        out.append(
            _feature_doc(
                fid.iloc[i], title.iloc[i], geom_type.iloc[i], coords,
                categories.iloc[i],
                address.iloc[i],
                links.iloc[i],
            )
        )
    return pd.Series(out)
