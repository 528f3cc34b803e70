"""Live-send wiring for checkpoint actions (pipelines/actions.py):
pluggable transport, payload shape per service, retry-on-5xx semantics.
Reference behavior: checkpoint/actions.py:176 (SlackNotificationAction.run).
No Ray needed — pure payload/transport logic."""

from __future__ import annotations

import json
import urllib.error

import pytest

from great_expectations_ray.pipelines.actions import (
    APINotificationAction,
    HttpTransport,
    OpsgenieAlertAction,
    PagerdutyAlertAction,
    SlackNotificationAction,
    ValidationAction,
)


class _Result:
    success = False
    suite_name = "s"

    def to_json_dict(self):
        return {
            "success": False, "suite_name": "s",
            "statistics": {"evaluated_expectations": 2,
                           "successful_expectations": 1,
                           "unsuccessful_expectations": 1},
            "results": [],
        }

    results: list = []


class _CaptureTransport:
    def __init__(self, status=200, text="ok"):
        self.calls = []
        self.status, self.text = status, text

    def __call__(self, url, body, headers):
        self.calls.append((url, body, headers))
        return self.status, self.text


def test_slack_live_send_posts_payload():
    t = _CaptureTransport()
    a = SlackNotificationAction(slack_webhook="https://hooks.example/x")
    out = a.run(_Result(), dry_run=False, transport=t)
    assert out["slack_result"] == 200
    (url, body, headers), = t.calls
    assert url == "https://hooks.example/x"
    assert headers["Content-Type"] == "application/json"
    payload = json.loads(body)
    assert payload["blocks"] and "Failed" in payload["text"]


def test_live_flag_sends_via_call():
    t = _CaptureTransport()
    a = SlackNotificationAction(slack_webhook="https://hooks.example/x",
                                live=True)
    # checkpoint invokes actions as callables; live=True -> real send path.
    # __call__ has no transport arg, so drive run() the way a live config
    # resolves dry_run (None -> not live), with the double injected.
    out = a.run(_Result(), transport=t)
    assert out["slack_result"] == 200 and len(t.calls) == 1
    # live flag survives the config round trip
    b = ValidationAction.from_config(a.to_json())
    assert isinstance(b, SlackNotificationAction) and b.live is True


def test_pagerduty_opsgenie_api_endpoints():
    t = _CaptureTransport()
    pd_a = PagerdutyAlertAction(routing_key="rk")
    pd_a.run(_Result(), dry_run=False, transport=t)
    og = OpsgenieAlertAction(api_key="k", region="eu")
    og.run(_Result(), dry_run=False, transport=t)
    api = APINotificationAction(url="https://api.example/hook")
    api.run(_Result(), dry_run=False, transport=t)
    urls = [c[0] for c in t.calls]
    assert urls == ["https://events.pagerduty.com/v2/enqueue",
                    "https://api.eu.opsgenie.com/v2/alerts",
                    "https://api.example/hook"]
    assert t.calls[1][2]["Authorization"] == "GenieKey k"
    api_body = json.loads(t.calls[2][1])
    assert "url" not in api_body and api_body["suite_name"] == "s"


def test_http_transport_retries_5xx_then_succeeds(monkeypatch):
    """5xx responses retry with backoff; success on a later attempt wins."""
    attempts = []
    sleeps = []

    def fake_urlopen(req, timeout=None):
        attempts.append(req.full_url)
        if len(attempts) < 3:
            raise urllib.error.HTTPError(
                req.full_url, 503, "unavailable", {}, None)

        class _R:
            status = 200

            def read(self):
                return b"ok"

            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

        return _R()

    monkeypatch.setattr("urllib.request.urlopen", fake_urlopen)
    t = HttpTransport(max_retries=3, backoff_s=0.5, sleep=sleeps.append)
    status, text = t("https://x.example/h", b"{}", {})
    assert status == 200 and text == "ok"
    assert len(attempts) == 3
    assert sleeps == [0.5, 1.0]  # exponential backoff


def test_http_transport_gives_up_after_max_retries(monkeypatch):
    def always_503(req, timeout=None):
        raise urllib.error.HTTPError(req.full_url, 503, "nope", {}, None)

    monkeypatch.setattr("urllib.request.urlopen", always_503)
    t = HttpTransport(max_retries=2, backoff_s=0.1, sleep=lambda s: None)
    with pytest.raises(urllib.error.HTTPError):
        t("https://x.example/h", b"{}", {})


def test_http_transport_no_retry_on_4xx(monkeypatch):
    calls = []

    def forbidden(req, timeout=None):
        calls.append(1)
        raise urllib.error.HTTPError(req.full_url, 403, "forbidden", {}, None)

    monkeypatch.setattr("urllib.request.urlopen", forbidden)
    t = HttpTransport(max_retries=3, sleep=lambda s: None)
    with pytest.raises(urllib.error.HTTPError):
        t("https://x.example/h", b"{}", {})
    assert len(calls) == 1  # 403 fails immediately


def test_email_live_raises_with_guidance():
    from great_expectations_ray.pipelines.actions import EmailAction

    a = EmailAction(receiver_emails="x@y.dev", notify_on="all")
    with pytest.raises(NotImplementedError, match="dry_run"):
        a.run(_Result(), dry_run=False)
