"""Bloom / cuckoo membership structure tests (SURVEY.md §5 layer 1)."""


from crusty_ray.state.bloom import ScalingBloom
from crusty_ray.state.cuckoo import CuckooFilter


class TestScalingBloom:
    def test_no_false_negatives(self):
        bf = ScalingBloom(capacity=1000, error_rate=0.001)
        items = [f"domain{i}.com" for i in range(800)]
        bf.add_batch(items)
        assert bf.contains_batch(items).all()

    def test_false_positive_rate(self):
        bf = ScalingBloom(capacity=5000, error_rate=0.001)
        bf.add_batch([f"in{i}" for i in range(5000)])
        probes = [f"out{i}" for i in range(20000)]
        fpr = bf.contains_batch(probes).mean()
        assert fpr < 0.005

    def test_scaling(self):
        bf = ScalingBloom(capacity=100, error_rate=0.01, expansion=2)
        items = [f"x{i}" for i in range(1000)]
        for i in range(0, 1000, 50):
            bf.add_batch(items[i:i + 50])
        assert len(bf.segments) > 1
        assert bf.contains_batch(items).all()

    def test_serialization_roundtrip(self):
        bf = ScalingBloom(capacity=200, seed=7)
        bf.add_batch([f"d{i}" for i in range(150)])
        bf2 = ScalingBloom.from_bytes(bf.to_bytes())
        probes = [f"d{i}" for i in range(300)] + [f"q{i}" for i in range(300)]
        assert list(bf.contains_batch(probes)) == list(bf2.contains_batch(probes))

    def test_oversized_batch_splits_across_segments(self):
        # one batch far larger than a segment's capacity must not overfill
        # it (that would blow the segment's sized-for FPP budget)
        bf = ScalingBloom(capacity=100, error_rate=0.01, expansion=2)
        items = [f"big{i}" for i in range(1000)]
        bf.add_batch(items)
        assert all(s.count <= s.capacity for s in bf.segments)
        assert bf.contains_batch(items).all()

    def test_compound_fpp_bounded_after_scaling(self):
        # RedisBloom-style tightening: after many scale-ups the OR over all
        # segments stays near 2x the configured rate, not segments x rate
        bf = ScalingBloom(capacity=500, error_rate=0.01, expansion=2)
        bf.add_batch([f"in{i}" for i in range(8000)])  # ~5 segments
        assert len(bf.segments) >= 4
        probes = [f"out{i}" for i in range(30000)]
        fpr = bf.contains_batch(probes).mean()
        assert fpr < 0.025, fpr  # 2x target + margin; untightened ~5x

    def test_seed_stability_across_instances(self):
        a, b = ScalingBloom(capacity=500, seed=3), ScalingBloom(capacity=500, seed=3)
        items = [f"i{i}" for i in range(400)]
        a.add_batch(items)
        b.add_batch(items)
        probes = [f"p{i}" for i in range(5000)]
        assert list(a.contains_batch(probes)) == list(b.contains_batch(probes))


class TestCuckooFilter:
    def test_insert_contains(self):
        cf = CuckooFilter(capacity=4096)
        items = [f"url{i}" for i in range(3000)]
        cf.add_batch(items)
        assert cf.contains_batch(items).all()
        assert cf.count == 3000

    def test_duplicates_not_double_counted(self):
        cf = CuckooFilter(capacity=1024)
        cf.add_batch(["a", "b", "a"])
        # "a" already contained on second occurrence within the batch
        assert cf.count == 2

    def test_delete(self):
        cf = CuckooFilter(capacity=1024)
        cf.add_batch(["a", "b", "c"])
        assert cf.delete_batch(["b"]) == 1
        assert "b" not in cf
        assert "a" in cf and "c" in cf
        assert cf.delete_batch(["zz"]) == 0

    def test_false_positive_rate(self):
        cf = CuckooFilter(capacity=1 << 14)
        cf.add_batch([f"in{i}" for i in range(10000)])
        probes = [f"out{i}" for i in range(50000)]
        assert cf.contains_batch(probes).mean() < 0.002  # 16-bit fp, 2 buckets

    def test_serialization_roundtrip(self):
        cf = CuckooFilter(capacity=2048, seed=5)
        cf.add_batch([f"u{i}" for i in range(1500)])
        cf2 = CuckooFilter.from_bytes(cf.to_bytes())
        probes = [f"u{i}" for i in range(3000)]
        assert list(cf.contains_batch(probes)) == list(cf2.contains_batch(probes))
        assert cf2.count == cf.count

    def test_high_load(self):
        cf = CuckooFilter(capacity=1024)
        items = [f"k{i}" for i in range(1000)]
        cf.add_batch(items)
        assert cf.contains_batch(items).all()  # stash absorbs overflow

    def test_forced_overflow_no_false_negatives(self):
        # Regression (ADVICE r1): stash entries recorded under the alt bucket
        # index were invisible to membership/delete — overload the table far
        # past capacity so the stash engages heavily, then demand zero FNs.
        cf = CuckooFilter(capacity=256, seed=11)
        items = [f"overflow-{i}" for i in range(2000)]
        cf.add_batch(items)
        assert len(cf.stash) > 0  # the stress must actually engage the stash
        assert cf.contains_batch(items).all()
        # and deletes must find stash entries too
        sample = items[::7]
        assert cf.delete_batch(sample) == len(sample)
