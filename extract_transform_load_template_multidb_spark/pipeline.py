"""Pipeline orchestration (SURVEY.md §2.4 C1–C5) — Spark-native.

The reference splits extract/transform/load into Airflow tasks that ship the
whole dataset through XCom pickles (``Template-to-MySQL/
BigQuery-to-MySQL-Method-1.py:67``); here a pipeline is ONE lazy DataFrame
plan — source → transforms → sink — with retry and notification hooks around
the single action. Scheduling stays external (cron/Airflow submitting
``spark-submit``), matching C1's ``@daily``.
"""

from __future__ import annotations

import logging
import smtplib
import time
from collections.abc import Callable
from dataclasses import dataclass, field
from email.mime.text import MIMEText

from pyspark.sql import DataFrame, SparkSession

log = logging.getLogger(__name__)


def smtp_sender(
    server_address: str,
    sender_email: str,
    recipient_emails: list[str],
    port: int = 25,
    smtp_factory: Callable[[str, int], object] = smtplib.SMTP,
) -> Callable[[str, str], None]:
    """Build an SMTP ``send(subject, body)`` matching reference C4
    (``Template-to-MySQL/BigQuery-to-MySQL-Method-1.py:35-46``): plain-text
    MIMEText, From/To/Subject headers, ``sendmail`` then ``quit``; send
    failures are logged, never raised (the reference prints and continues —
    a notification must not fail the load it reports on).

    ``smtp_factory`` is injectable for tests (any object with
    ``sendmail``/``quit``).
    """

    def send(subject: str, body: str) -> None:
        try:
            server = smtp_factory(server_address, port)
            msg = MIMEText(body)
            msg["From"] = sender_email
            msg["To"] = ", ".join(recipient_emails)
            msg["Subject"] = subject
            server.sendmail(sender_email, recipient_emails, msg.as_string())
            server.quit()
            log.info("Email notification sent successfully!")
        except Exception as e:  # noqa: BLE001 — reference swallows and logs
            log.error("Failed to send email: %s", e)

    return send


@dataclass
class Notifier:
    """Success/failure notification hook (reference C4: SMTP emails with the
    loaded record count, ``BigQuery-to-MySQL-Method-1.py:35-46,:86``).

    ``send`` is injectable; the default logs. An SMTP sender plugs in as
    ``Notifier(send=smtp_send)`` without touching pipeline code.
    """

    send: Callable[[str, str], None] = lambda subject, body: log.info(
        "%s: %s", subject, body
    )

    def success(self, pipeline: str, n_records: int) -> None:
        self.send(
            f"Data Load Successful: {pipeline}",
            f"The data load has completed successfully. Records: {n_records}",
        )

    def failure(self, pipeline: str, error: Exception) -> None:
        self.send(
            f"Data Load Failed: {pipeline}",
            f"The data load has failed: {error}",
        )


@dataclass
class Pipeline:
    """Declarative extract→transform→load spec.

    - ``source``:     (spark) -> DataFrame  (lazy scan)
    - ``transforms``: list of DataFrame -> DataFrame
    - ``sink``:       (DataFrame) -> None   (the single action)
    - ``retries``/``retry_delay``: reference C1 default_args
      (1 retry / 5 min, ``BigQuery-to-MySQL-Method-1.py:17-18``; tests use
      a tiny delay).

    Returns the loaded record count (C5 — the reference's only metric).
    """

    name: str
    source: Callable[[SparkSession], DataFrame]
    sink: Callable[[DataFrame], None]
    transforms: list[Callable[[DataFrame], DataFrame]] = field(default_factory=list)
    notifier: Notifier = field(default_factory=Notifier)
    retries: int = 1
    retry_delay: float = 300.0

    def build(self, spark: SparkSession) -> DataFrame:
        """Compose the lazy plan without executing it."""
        df = self.source(spark)
        for t in self.transforms:
            df = t(df)
        return df

    def run(self, spark: SparkSession) -> int:
        attempt = 0
        while True:
            try:
                df = self.build(spark)
                # Count and load from one cached plan so the notified metric
                # matches what was written (the reference counts the same
                # in-memory frame it loads).
                df = df.cache()
                try:
                    n = df.count()
                    self.sink(df)
                finally:
                    df.unpersist()
                self.notifier.success(self.name, n)
                return n
            except Exception as exc:  # noqa: BLE001 — notify then retry/raise
                self.notifier.failure(self.name, exc)
                attempt += 1
                if attempt > self.retries:
                    raise
                log.warning(
                    "pipeline %s attempt %d failed (%s); retrying in %.0fs",
                    self.name,
                    attempt,
                    exc,
                    self.retry_delay,
                )
                time.sleep(self.retry_delay)
