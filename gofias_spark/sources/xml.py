"""Distributed attribute-only XML scan (SURVEY.md §2.1 S3).

The reference streams FIAS dump XML SAX-style — one element type per file,
data carried entirely in attributes — into a channel of structs
(/root/reference/app/util/xml.go:15-43 with a per-file goroutine; element
decoders /root/reference/app/domain/address/service/adressImportService.go:
57-91 and houseImportService.go:51-79).

Spark shape: the file list is the parallelism unit (as in the reference —
one stream per file), `mapInPandas` over a one-column DataFrame of paths;
each task incrementally parses its files (``iterparse`` — constant memory,
the 64 KiB read-buffer analogue of xml.go:26) and emits Arrow batches of
attribute columns. Unknown attributes are dropped, missing ones are null —
mirroring the closed-contract ``"dynamic": false`` mappings
(elasticAddressRepository.go:65).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_BATCH = 10_000  # rows per emitted Arrow batch (reference bulk batch.size,
                 # config.yaml:10-11)


def read_attribute_xml(
    spark: SparkSession,
    paths: list[str],
    element: str,
    columns: dict[str, str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Parse ``<element attr=.../>`` rows from XML files into a DataFrame.

    ``columns`` maps XML attribute name -> output column name. All columns
    are strings (the reference parses everything as string attributes and
    converts later, entity/address.go:4-53); cast downstream.
    """
    import pandas as pd

    num_partitions = num_partitions or min(len(paths), 64) or 1
    out_cols = list(columns.values())
    attr_of = dict(columns)

    def parse(batches):
        import xml.etree.ElementTree as ET

        for pdf in batches:
            rows: list[list] = []
            for path in pdf["path"]:
                # iterparse streams, but parsed elements stay ATTACHED to
                # the root: clearing only matched elements still grows the
                # tree O(total elements) on a FIAS-scale file. Grab the root
                # at the start event and periodically drop its accumulated
                # children — true constant memory, the 64 KiB read-buffer
                # analogue of the reference's SAX loop (xml.go:15-43).
                root = None
                since_trim = 0
                for ev, el in ET.iterparse(path, events=("start", "end")):
                    if ev == "start":
                        if root is None:
                            root = el
                        continue
                    tag = el.tag.rsplit("}", 1)[-1]
                    if tag == element:
                        rows.append([el.get(a) for a in attr_of])
                        if len(rows) >= _BATCH:
                            yield pd.DataFrame(rows, columns=out_cols)
                            rows = []
                    el.clear()
                    since_trim += 1
                    if root is not None and since_trim >= _BATCH:
                        del root[:]
                        since_trim = 0
            if rows:
                yield pd.DataFrame(rows, columns=out_cols)

    schema = T.StructType(
        [T.StructField(c, T.StringType(), True) for c in out_cols]
    )
    pdf = spark.createDataFrame(
        [(p,) for p in paths], schema="path string"
    ).repartition(num_partitions)
    return pdf.mapInPandas(parse, schema=schema)
