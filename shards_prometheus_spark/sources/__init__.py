"""Sources & sinks.

The reference's only I/O is the HTTP pull endpoint serving the text
exposition format (prometheus.cpp:47,73,80). Here:

- ``exposition``  — renders the registry snapshot in that text format
  (the scrape payload as a DataFrame of lines).
- ``query_api``   — the paired server's HTTP *read* API
  (`/api/v1/query`, `/api/v1/query_range`) served by MetricsExposer:
  PromQL in, public-format JSON out.
- ``storage``     — the 100 TB physical layout: (date, metric)-
  partitioned parquet writers/readers that make partition pruning and
  row-group skipping real.
- ``scraper``     — the live scrape LOOP: a Python streaming
  DataSource whose micro-batches are scrape ticks (one HTTP GET per
  target per tick, executor-side), closing the reference's
  exposer↔server pairing.
- ``remote_write`` — the paired server's PUSH ingestion path: the
  public snappy+protobuf WriteRequest wire format, decoded/encoded
  distributed (mapInPandas) and served by an HTTP receiver the read
  API can sit on.
"""

from shards_prometheus_spark.sources.exposition import (  # noqa: F401
    MetricsExposer,
    exposition_lines,
)
from shards_prometheus_spark.sources.query_api import (  # noqa: F401
    handle_api_request,
)
from shards_prometheus_spark.sources.remote_write import (  # noqa: F401
    RemoteWriteReceiver,
    decode_write_requests,
    encode_write_requests,
)
from shards_prometheus_spark.sources.scraper import (  # noqa: F401
    SYNTHETIC_METRICS,
    registry_from_scrapes,
    scrape_once,
    scrape_stream,
    scraped_samples,
    scraped_with_staleness,
    stale_markers,
)
from shards_prometheus_spark.sources.storage import (  # noqa: F401
    read_samples_partitioned,
    write_samples_partitioned,
)
