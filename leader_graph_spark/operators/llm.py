"""Model-backed batch-inference operators (SURVEY.md §2.8 X8-X10).

The reference structures free-text career histories through GPT-4o
function calls inside a thread pool with a req/s + tokens/min rate
limiter and a cost-cap circuit breaker
(``leader/bio_processor.py:304-475``). In Spark the same operator is an
Arrow-batched ``mapInPandas`` with:

- a pluggable backend (the real one would call an external service;
  the ``DeterministicFakeBackend`` here parses career lines by rule so
  CI is hermetic and oracle-friendly);
- a per-partition token-bucket rate limiter (the distributed analog of
  the reference's global lock: each of N partitions gets rate/N);
- a cost accumulator checked between batches (circuit breaker);
- incremental-rerun semantics by skipping rows whose output column is
  already populated (P5, ``leader/bio_processor.py:572-588``).
"""

from __future__ import annotations

import json
import re
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_FIELDS = [
    ("event_type", T.StringType()),
    ("start_year", T.IntegerType()),
    ("start_month", T.IntegerType()),
    ("end_year", T.IntegerType()),
    ("end_month", T.IntegerType()),
    ("is_end", T.BooleanType()),
    ("has_end_date", T.BooleanType()),
    ("school", T.StringType()),
    ("place", T.StringType()),
    ("position", T.StringType()),
]

EVENT_SCHEMA = T.StructType([T.StructField(n, t) for n, t in EVENT_FIELDS])
EVENTS_SCHEMA = T.ArrayType(EVENT_SCHEMA)

# ``YYYY.MM-YYYY.MM <text>`` or ``YYYY-`` open-ended (至今-style) lines —
# the same career-line shapes the reference's demo fixture uses
# (``src/bio_demo.py:161-166``).
_LINE_RE = re.compile(
    r"(?P<sy>\d{4})(?:\.(?P<sm>\d{1,2}))?\s*[-—至]\s*(?:(?P<ey>\d{4})(?:\.(?P<em>\d{1,2}))?|(?P<now>今|now))?\s*(?P<rest>.*)"
)
_STUDY_MARKERS = ("学习", "大学", "学院", "study", "university", "college")


class DeterministicFakeBackend:
    """Rule-based stand-in for the LLM call: parses one career line per
    text line into a typed event. Deterministic, dependency-free."""

    cost_per_row = 0.0001

    def extract(self, text: str) -> list[dict]:
        events = []
        for line in (text or "").splitlines():
            m = _LINE_RE.match(line.strip())
            if not m:
                continue
            rest = m.group("rest").strip()
            is_study = any(k in rest for k in _STUDY_MARKERS)
            open_ended = m.group("now") is not None or (
                m.group("ey") is None and m.group("now") is None
            )
            events.append(
                {
                    "event_type": "study" if is_study else "work",
                    "start_year": int(m.group("sy")),
                    "start_month": int(m.group("sm")) if m.group("sm") else None,
                    "end_year": int(m.group("ey")) if m.group("ey") else None,
                    "end_month": int(m.group("em")) if m.group("em") else None,
                    "is_end": not open_ended,
                    "has_end_date": m.group("ey") is not None,
                    "school": rest if is_study else None,
                    "place": None if is_study else rest,
                    "position": None if is_study else rest,
                }
            )
        return events


class HttpExtractionBackend:
    """Real-HTTP seam for the X8 extraction service (the reference
    POSTs to OpenAI at ``leader/bio_processor.py:403``; here the
    endpoint is injected so tests can stand up a MISBEHAVING local
    server — timeouts, 429s, 5xx, garbage payloads — and drive the
    retry/ratelimit/DLQ machinery against a real socket instead of
    injected Python exceptions). stdlib ``urllib`` only.

    Contract: POST the text body, expect ``{"events": [...]}`` JSON
    back. Failures raise with a stable taxonomy prefix the DLQ
    records verbatim: ``timeout:``, ``http-429:``, ``http-<code>:``,
    ``bad-json:``. An optional :class:`TokenBucket` gates every
    request (including retries) — the per-worker slice of the global
    req/s budget."""

    cost_per_row = 0.0001

    def __init__(self, url: str, *, timeout: float = 5.0, bucket: "TokenBucket | None" = None):
        self.url = url
        self.timeout = timeout
        self.bucket = bucket

    def extract(self, text: str) -> list[dict]:
        import socket
        import urllib.error
        import urllib.request

        if self.bucket is not None:
            self.bucket.acquire()
        req = urllib.request.Request(
            self.url,
            data=(text or "").encode("utf-8"),
            headers={"Content-Type": "text/plain; charset=utf-8"},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                body = resp.read()
        except urllib.error.HTTPError as exc:
            raise RuntimeError(f"http-{exc.code}: {exc.reason}") from exc
        except (TimeoutError, socket.timeout) as exc:
            raise RuntimeError(f"timeout: no response in {self.timeout}s") from exc
        except urllib.error.URLError as exc:
            if isinstance(exc.reason, (TimeoutError, socket.timeout)):
                raise RuntimeError(f"timeout: no response in {self.timeout}s") from exc
            raise RuntimeError(f"connect: {exc.reason}") from exc
        try:
            payload = json.loads(body.decode("utf-8"))
            events = payload["events"]
            if not isinstance(events, list):
                raise ValueError("events is not a list")
        except Exception as exc:  # noqa: BLE001 — taxonomy boundary
            raise RuntimeError(f"bad-json: {exc}") from exc
        return events


class TokenBucket:
    """Per-partition rate limiter: ``rate`` requests/second with burst
    ``burst`` — the distributed version of the reference's global
    req/s lock (``leader/bio_processor.py:315-340``)."""

    def __init__(self, rate: float, burst: int = 10):
        self.rate = rate
        self.capacity = float(burst)
        self.tokens = float(burst)
        self.last = time.monotonic()

    def acquire(self) -> None:
        while True:
            now = time.monotonic()
            self.tokens = min(self.capacity, self.tokens + (now - self.last) * self.rate)
            self.last = now
            if self.tokens >= 1:
                self.tokens -= 1
                return
            time.sleep((1 - self.tokens) / self.rate)


def structured_extraction(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    output_col: str = "events",
    backend_factory: Callable[[], object] = DeterministicFakeBackend,
    requests_per_second: float | None = None,
    cost_limit: float | None = None,
) -> DataFrame:
    """X8/X9: free text → typed event array via a pluggable batch
    backend. Returns (id, events array<struct>, cost, status).

    ``cost_limit`` is a PER-PARTITION budget enforced via the backend's
    ``cost_per_row`` (each of N partitions may spend up to the cap, so
    the global ceiling is ``n_partitions × cost_limit``; a global
    driver-side budget check between micro-batches belongs to the
    streaming variant). Rows skipped by the circuit breaker are NOT
    dropped: they come back with ``status='skipped_budget'`` and a null
    event array, mirroring the DLQ pattern, so consumers can split
    unprocessed rows from genuinely-empty extractions and re-drive them
    via the P5 anti-join."""
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("events_json", T.StringType()),
            T.StructField("cost", T.DoubleType()),
            T.StructField("status", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = backend_factory()
        bucket = TokenBucket(requests_per_second) if requests_per_second else None
        spent = 0.0
        for pdf in batches:
            out_rows = []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                if cost_limit is not None and spent >= cost_limit:
                    # circuit breaker: stop spending; emit as skipped.
                    out_rows.append((rid, None, 0.0, "skipped_budget"))
                    continue
                if bucket:
                    bucket.acquire()
                events = backend.extract(text)
                spent += backend.cost_per_row
                out_rows.append(
                    (rid, json.dumps({"events": events}), backend.cost_per_row, "ok")
                )
            yield pd.DataFrame(
                out_rows, columns=[id_col, "events_json", "cost", "status"]
            )

    extracted = df.select(id_col, text_col).mapInPandas(run, out_schema)
    return extracted.select(
        id_col,
        F.from_json(
            F.get_json_object("events_json", "$.events"), EVENTS_SCHEMA
        ).alias(output_col),
        "cost",
        "status",
    )


def pending_rows(df: DataFrame, *, output_col: str) -> DataFrame:
    """P5 incremental-rerun filter: only rows not yet structured
    (``leader/bio_processor.py:572-588``)."""
    return df.filter(F.col(output_col).isNull())


class RetryingBackend:
    """Wrap a backend with in-UDF retries (the reference's
    retry-with-requeue, ``processor/data_processor.py:331-419``:
    3 attempts, then a terminal-failure record). Deterministic backoff
    hook for tests; terminal failures surface as error rows for the
    DLQ split instead of raising."""

    def __init__(self, inner, *, max_retries: int = 3, sleep=None):
        self.inner = inner
        self.max_retries = max_retries
        self.sleep = sleep or (lambda attempt: None)
        self.cost_per_row = getattr(inner, "cost_per_row", 0.0)

    def extract_with_status(self, text: str) -> tuple[list[dict] | None, str | None, int]:
        last_err = None
        for attempt in range(1, self.max_retries + 1):
            try:
                return self.inner.extract(text), None, attempt
            except Exception as exc:  # noqa: BLE001 — external-call seam
                last_err = str(exc)
                self.sleep(attempt)
        return None, last_err, self.max_retries


def structured_extraction_with_dlq(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    backend_factory: Callable[[], object],
    max_retries: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """X8 with failure semantics: returns (results, dead_letter).
    Failed rows retry in-UDF up to ``max_retries``; terminal failures
    land in the dead-letter DataFrame with the error and attempt count
    (re-drivable via the P5 anti-join pattern)."""
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("events_json", T.StringType()),
            T.StructField("error", T.StringType()),
            T.StructField("attempts", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = RetryingBackend(backend_factory(), max_retries=max_retries)
        for pdf in batches:
            rows = []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                events, err, attempts = backend.extract_with_status(text)
                payload = None if events is None else json.dumps({"events": events})
                rows.append((rid, payload, err, attempts))
            yield pd.DataFrame(rows, columns=[id_col, "events_json", "error", "attempts"])

    # Materialize BEFORE the ok/dlq split: both branches derive from
    # the same mapInPandas, and without materialization each downstream
    # action re-executes it — i.e. re-calls the PAID external service
    # once per branch (observed live against the scripted HTTP server:
    # the flaky doc was hit 4×, not 3). localCheckpoint (not persist):
    # persist pins blocks in the cache manager for the session unless
    # someone unpersists — and with two independent return values there
    # is no single point where "both branches are consumed" — whereas
    # localCheckpoint blocks are released by the ContextCleaner once
    # the returned frames are garbage-collected. The materialized
    # result is id+json+error — tiny next to the calls it avoids.
    raw = df.select(id_col, text_col).mapInPandas(run, out_schema).localCheckpoint()
    ok = raw.filter(F.col("error").isNull()).select(
        id_col,
        F.from_json(F.get_json_object("events_json", "$.events"), EVENTS_SCHEMA).alias(
            "events"
        ),
        "attempts",
    )
    dlq = raw.filter(F.col("error").isNotNull()).select(id_col, "error", "attempts")
    return ok, dlq


NEWS_SCHEMA = T.StructType(
    [
        T.StructField("leader", T.StringType()),
        T.StructField("location", T.StringType()),
        T.StructField("event", T.StringType()),
        T.StructField("targets", T.ArrayType(T.StringType())),
        T.StructField("accompanying", T.ArrayType(T.StringType())),
    ]
)


class FakeNewsBackend:
    """X10 news-extraction stand-in (``src/news_processor.py:60-132``):
    deterministic rule-based pull of the nested struct the reference's
    NewsExtraction schema defines (leader, location, event, targets[],
    accompanying[])."""

    cost_per_row = 0.0001

    def extract_news(self, text: str) -> dict:
        import re as _re

        def group(pat):
            m = _re.search(pat, text or "")
            return m.group(1).strip() if m else None

        def group_list(pat):
            m = _re.search(pat, text or "")
            return [t.strip() for t in m.group(1).split("、")] if m else []

        return {
            # Lazy quantifier: with two officials in one sentence
            # ("张伟书记和李明市长…"), greedy matching would backtrack to
            # the LAST title suffix and capture the merged name run.
            "leader": group(r"(?:^|。)([\w·]+?)(?:书记|市长|省长|主任)"),
            "location": group(r"在([\w]+?)(?:调研|考察|主持|出席)"),
            "event": group(r"(调研|考察|主持会议|出席活动)"),
            "targets": group_list(r"(?:调研|考察)([\w、]+?)(?:等|。|$)"),
            "accompanying": group_list(r"陪同的有([\w、]+?)(?:等|。|$)"),
        }


class FakeTitleClassifier:
    """P9 boolean-classifier stand-in (``src/news_demo.py:46-105``:
    ``classify_news_by_title(title) -> bool`` gating extraction).
    Deterministic rule: a title is a leader-activity story when it
    carries an activity verb. A real deployment swaps in a model call
    behind the same per-batch interface."""

    ACTIVITY_VERBS = ("调研", "考察", "主持会议", "出席活动")

    def classify(self, title: str) -> bool:
        return any(v in (title or "") for v in self.ACTIVITY_VERBS)


def classify_news_titles(df: DataFrame, *, id_col: str, title_col: str) -> DataFrame:
    """P9 as mapInPandas: adds ``is_leader_activity`` — the
    model-backed boolean that gates the expensive extraction stage
    (filter BEFORE X10, so non-matching rows never reach the
    per-row-costly backend)."""
    out_schema = T.StructType(
        [
            df.schema[id_col],
            df.schema[title_col],
            T.StructField("is_leader_activity", T.BooleanType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = FakeTitleClassifier()
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    title_col: pdf[title_col],
                    "is_leader_activity": pdf[title_col].map(backend.classify),
                }
            )

    return df.select(id_col, title_col).mapInPandas(run, out_schema)


def news_extraction(df: DataFrame, *, id_col: str, text_col: str) -> DataFrame:
    """X10 as mapInPandas → nested struct; downstream ``explode`` of
    targets/accompanying is plain relational."""
    out_schema = T.StructType([df.schema[id_col], T.StructField("news", NEWS_SCHEMA)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = FakeNewsBackend()
        for pdf in batches:
            parsed = pdf[text_col].map(backend.extract_news)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "news": parsed.map(
                        lambda d: (
                            d["leader"],
                            d["location"],
                            d["event"],
                            d["targets"],
                            d["accompanying"],
                        )
                    ),
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, out_schema)
