"""Notification fallback chain + alarm-threshold evaluation tests
(reference ``agf_reconciliation_lambda.py:275-345`` and
``cloudformation/agf-monitoring-alarms.yaml:52-155``)."""

from __future__ import annotations

import datetime as dt
import io

from agf_data_ingestion_spark.operators.alarms import (
    REFERENCE_ALARMS,
    AlarmSpec,
    evaluate_alarm,
    evaluate_alarms,
)
from agf_data_ingestion_spark.operators.notify import (
    NotificationChain,
    Notifier,
    print_notifier,
    reconciliation_subject,
)


def _failing(name, log):
    def send(subject, body):
        log.append((name, "attempt"))
        raise ConnectionError(f"{name} unreachable")

    return Notifier(name, send)


def _working(name, log, max_subject=None):
    def send(subject, body):
        log.append((name, subject, body))

    return Notifier(name, send, max_subject=max_subject)


def test_first_channel_wins_stops_chain():
    log = []
    chain = NotificationChain([_working("sns", log), _working("ses", log)])
    out = chain.notify("subj", "body")
    assert out.sent and out.channel == "sns" and out.errors == []
    assert [e[0] for e in log] == ["sns"]  # ses never attempted


def test_fallback_order_sns_ses_print():
    log = []
    metrics = []
    chain = NotificationChain(
        [_failing("sns", log), _working("ses", log)],
        metrics_hook=metrics.append,
    )
    out = chain.notify("subj", "body")
    assert out.sent and out.channel == "ses"
    assert out.errors == [("sns", "sns unreachable")]
    assert metrics == [True]  # NotificationSuccess


def test_all_channels_fail_report_still_printed_and_failure_metric():
    log = []
    metrics = []
    sink = io.StringIO()
    chain = NotificationChain(
        [_failing("sns", log), _failing("ses", log)],
        metrics_hook=metrics.append,
        report_stream=sink,
    )
    out = chain.notify("SUBJ", "THE REPORT")
    assert not out.sent and out.channel is None
    assert [c for c, _ in out.errors] == ["sns", "ses"]
    assert "THE REPORT" in sink.getvalue()  # reference :327 — never lost
    assert metrics == [False]  # NotificationFailure


def test_subject_truncated_per_channel_cap():
    log = []
    chain = NotificationChain([_working("sns", log, max_subject=100)])
    chain.notify("x" * 150, "body")
    assert len(log[0][1]) == 100  # reference :304 subject[:100]


def test_metrics_hook_errors_swallowed():
    def bad_hook(success):
        raise RuntimeError("cloudwatch down")

    chain = NotificationChain([_working("sns", [])], metrics_hook=bad_hook)
    assert chain.notify("s", "b").sent  # no raise (reference :288-289)


def test_print_notifier_writes_stream():
    sink = io.StringIO()
    out = NotificationChain([print_notifier(sink)]).notify("S", "B")
    assert out.sent and out.channel == "print"
    assert sink.getvalue() == "S\nB\n"


def test_reconciliation_subject_counts():
    assert reconciliation_subject(3, 4) == (
        "[AGF] S3-DynamoDB Reconciliation: 7 discrepancies found"
    )


# ---------------------------------------------------------------------------
# alarm evaluation
# ---------------------------------------------------------------------------

NOW = dt.datetime(2024, 6, 1, 12, 0, 0)


def _metrics(spark, rows):
    return spark.createDataFrame(
        [(dt.datetime.fromtimestamp(ts), m, float(v)) for ts, m, v in rows],
        "ts timestamp, metric string, value double",
    )


def test_error_alarm_fires_on_any_error(spark):
    base = int(NOW.timestamp()) - 300  # inside the last complete 5-min period
    spec = AlarmSpec("ingest-errors", "errors", "sum", 300, 0.0)
    m = _metrics(spark, [(base + 10, "errors", 1), (base + 20, "errors", 2)])
    st = evaluate_alarm(m, spec, now=NOW)
    assert st.state == "ALARM" and st.period_values == (3.0,)


def test_missing_data_not_breaching(spark):
    spec = AlarmSpec("ingest-errors", "errors", "sum", 300, 0.0)
    st = evaluate_alarm(_metrics(spark, []), spec, now=NOW)
    assert st.state == "OK" and st.period_values == (None,)


def test_duration_max_threshold(spark):
    base = int(NOW.timestamp()) - 300
    spec = AlarmSpec("batch-duration-ms", "duration_ms", "max", 300, 270_000.0)
    ok = _metrics(spark, [(base + 5, "duration_ms", 100_000)])
    bad = _metrics(spark, [(base + 5, "duration_ms", 290_000)])
    assert evaluate_alarm(ok, spec, now=NOW).state == "OK"
    assert evaluate_alarm(bad, spec, now=NOW).state == "ALARM"


def test_concurrency_requires_all_five_periods(spark):
    spec = AlarmSpec(
        "concurrency", "concurrent_batches", "max", 60, 10.0, evaluation_periods=5
    )
    end = int(NOW.timestamp()) // 60 * 60
    rows_4of5 = [
        (end - 60 * (i + 1) + 5, "concurrent_batches", 12) for i in range(4)
    ]
    rows_5of5 = rows_4of5 + [(end - 60 * 5 + 5, "concurrent_batches", 12)]
    assert evaluate_alarm(_metrics(spark, rows_4of5), spec, now=NOW).state == "OK"
    assert evaluate_alarm(_metrics(spark, rows_5of5), spec, now=NOW).state == "ALARM"


def test_only_complete_periods_evaluated(spark):
    """Events AFTER the last complete period boundary (the in-progress
    window) must not affect the evaluation."""
    spec = AlarmSpec("ingest-errors", "errors", "sum", 300, 0.0)
    boundary = int(NOW.timestamp()) // 300 * 300
    m = _metrics(spark, [(boundary + 10, "errors", 5)])  # in-progress period
    st = evaluate_alarm(m, spec, now=dt.datetime.fromtimestamp(boundary + 30))
    assert st.state == "OK"


def test_reference_alarm_pack_evaluates(spark):
    base = int(NOW.timestamp()) - 300
    m = _metrics(
        spark,
        [(base + 1, "errors", 1), (base + 2, "duration_ms", 280_000)],
    )
    states = {s.name: s.state for s in evaluate_alarms(m, REFERENCE_ALARMS, now=NOW)}
    assert states["ingest-errors"] == "ALARM"
    assert states["batch-duration-ms"] == "ALARM"
    assert states["sink-throttles"] == "OK"
    assert states["concurrency"] == "OK"


class _FakeSMTPServer:
    """Minimal in-process SMTP server (raw sockets, stdlib only): accepts
    one connection, speaks just enough of RFC 5321 for smtplib to deliver,
    records the DATA payload."""

    def __init__(self, fail: bool = False):
        import socket
        import threading

        self.fail = fail
        self.messages: list[bytes] = []
        self._sock = socket.socket()
        self._sock.bind(("127.0.0.1", 0))
        self._sock.listen(1)
        self.port = self._sock.getsockname()[1]
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self):
        conn, _ = self._sock.accept()
        f = conn.makefile("rb")

        def reply(line):
            conn.sendall(line + b"\r\n")

        reply(b"220 fake ESMTP")
        data_mode = False
        buf = b""
        while True:
            line = f.readline()
            if not line:
                break
            if data_mode:
                if line.rstrip(b"\r\n") == b".":
                    self.messages.append(buf)
                    data_mode = False
                    reply(b"250 OK")
                else:
                    buf += line
                continue
            cmd = line.strip().upper()
            if cmd.startswith(b"EHLO") or cmd.startswith(b"HELO"):
                reply(b"250 fake")
            elif cmd.startswith(b"MAIL FROM"):
                reply(b"550 rejected" if self.fail else b"250 OK")
            elif cmd.startswith(b"RCPT TO"):
                reply(b"250 OK")
            elif cmd == b"DATA":
                data_mode = True
                reply(b"354 go")
            elif cmd == b"QUIT":
                reply(b"221 bye")
                break
            else:
                reply(b"250 OK")
        conn.close()
        self._sock.close()


def test_smtp_notifier_delivers_real_bytes():
    from agf_data_ingestion_spark.operators.notify import (
        NotificationChain,
        smtp_notifier,
    )

    srv = _FakeSMTPServer()
    chain = NotificationChain(
        [
            smtp_notifier(
                host="127.0.0.1",
                port=srv.port,
                sender="agf@example.test",
                recipients=["ops@example.test"],
            )
        ]
    )
    out = chain.notify("AGF Reconciliation Report", "2 orphans found")
    assert out.sent and out.channel == "smtp"
    srv._thread.join(timeout=10)
    assert len(srv.messages) == 1
    payload = srv.messages[0]
    assert b"AGF Reconciliation Report" in payload
    assert b"2 orphans found" in payload


def test_smtp_notifier_failure_falls_through(capsys):
    from agf_data_ingestion_spark.operators.notify import (
        NotificationChain,
        print_notifier,
        smtp_notifier,
    )

    srv = _FakeSMTPServer(fail=True)
    chain = NotificationChain(
        [
            smtp_notifier(
                host="127.0.0.1",
                port=srv.port,
                sender="agf@example.test",
                recipients=["ops@example.test"],
            ),
            print_notifier(),
        ]
    )
    out = chain.notify("subj", "body")
    # SMTP rejected -> chain falls through to the print channel
    assert out.sent and out.channel == "print"
    assert any(name == "smtp" for name, _ in out.errors)
    assert "subj" in capsys.readouterr().out
