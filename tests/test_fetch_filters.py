"""FetchStage status/load filter chain units (F8/F9 + caps, rules.rs:81-94)."""

from crusty_ray.config import test_config as _tc
from crusty_ray.datagen.webgraph import SyntheticWeb, WebConfig
from crusty_ray.stages.fetch import FetchStage

WEB_CFG = WebConfig(n_domains=80, max_pages_per_domain=25)
WEB = SyntheticWeb(WEB_CFG)


def _find(pred, limit=2000):
    """First (i, j, rec) whose RAW page record satisfies pred."""
    n = 0
    for i in range(WEB_CFG.n_domains):
        for j in range(WEB.n_pages(i)):
            rec = WEB.page_record(WEB.page_url(i, j))
            if pred(rec):
                return i, j, rec
            n += 1
            if n > limit:
                return None
    return None


class TestRedirects:
    def test_redirect_followed_to_content(self):
        got = _find(lambda r: r["status_code"] in (301, 302))
        assert got is not None
        i, j, rec = got
        f = FetchStage(WEB_CFG, _tc())
        row = f.fetch_one(WEB.page_url(i, j), WEB.domain_name(i), 0, 0)
        assert row["redirects"] >= 1
        assert row["term_by"] != "redirect_limit" or row["redirects"] > 5

    def test_redirect_limit_zero(self):
        cfg = _tc()
        cfg.rules.max_redirect = 0
        got = _find(lambda r: r["status_code"] in (301, 302))
        i, j, _ = got
        f = FetchStage(WEB_CFG, cfg)
        row = f.fetch_one(WEB.page_url(i, j), WEB.domain_name(i), 0, 0)
        assert row["term_by"] == "redirect_limit"


class TestLoadCaps:
    def test_size_cap(self):
        cfg = _tc()
        cfg.crawl.max_response_size = 10  # everything exceeds
        got = _find(lambda r: r["status_code"] == 200
                    and r["content_type"] == "text/html" and r["size_b"] > 10)
        i, j, _ = got
        f = FetchStage(WEB_CFG, cfg)
        row = f.fetch_one(WEB.page_url(i, j), WEB.domain_name(i), 0, 0)
        assert row["term_by"] == "load_size"
        assert row["links"] == []

    def test_load_timeout(self):
        cfg = _tc()
        cfg.crawl.load_timeout_ms = 1
        got = _find(lambda r: r["status_code"] == 200
                    and r["content_type"] == "text/html" and r["fetch_ms"] > 1)
        i, j, _ = got
        f = FetchStage(WEB_CFG, cfg)
        row = f.fetch_one(WEB.page_url(i, j), WEB.domain_name(i), 0, 0)
        assert row["term_by"] == "load_timeout"

    def test_content_type_config(self):
        cfg = _tc()
        cfg.crawl.accept_content_types_status = ("text/plain",)  # html rejected
        got = _find(lambda r: r["status_code"] == 200
                    and r["content_type"] == "text/html")
        i, j, _ = got
        f = FetchStage(WEB_CFG, cfg)
        row = f.fetch_one(WEB.page_url(i, j), WEB.domain_name(i), 0, 0)
        assert row["term_by"] == "status_content_type"


def test_yaml_tuple_field_merge(tmp_path):
    """Tuple-typed config fields accept yaml lists (accept_content_types_*)."""
    from crusty_ray.config import load_config
    p = tmp_path / "c.yaml"
    p.write_text("crawl:\n  accept_content_types_status: [text/html]\n")
    cfg = load_config(str(p), env={})
    assert cfg.crawl.accept_content_types_status == ("text/html",)
