"""Stream-facing commit-op classification, shared between the
transactional table (``sinks.lakehouse``, driver-side) and the
``lakehouse`` Python Data Source (``sources.lakehouse_source``, whose
module is imported by every COLD data-source worker fork).

A leaf module on purpose (r19, guide §4.5 — the same cold-fork import
diet as r18's lazy-pandas fix): the data source needs exactly these
two constants from the sink plane, and importing the full
``sinks.lakehouse`` module for them pulls ~3700 lines of driver-side
DataFrame machinery into every fresh worker process. Warm-cache cost
is ~30 ms per fork; under the page-cache-evicted regime the r18 DSv2
probe documented, faulting that module back in is the multi-second
path this split avoids.

Ops whose added files are PURE NEW ROWS are streamable as appends;
rewrite-only ops change the file set but no logical row. NOTE a
bootstrap (v==1) commit of ANY op is all new rows by definition — both
consumers override it to "append" by version, not by op name (no
writer emits a distinct bootstrap op).
"""

from __future__ import annotations

STREAM_APPEND_OPS = {"append"}
STREAM_REWRITE_OPS = {"optimize"}
