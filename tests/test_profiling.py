"""utils/profiling helpers. The device-trace busy time backs the bench's
transport-noise-free cross-checks (PERF.md 'phantom timings'), so the
interval-union math — overlaps once, gaps never — is pinned here."""

from robocupvision_tpu.utils.profiling import interval_union_length


def test_union_counts_gaps_never_and_overlaps_once():
    # two 10-us ops with a 30-us idle gap: busy is 20, wall span would be 50
    assert interval_union_length([(0, 10), (40, 50)]) == 20
    # nested (module span enclosing op spans): union is the outer span only
    assert interval_union_length([(0, 100), (10, 20), (30, 40)]) == 100
    # partial overlap merges
    assert interval_union_length([(0, 10), (5, 15)]) == 15
    assert interval_union_length([]) == 0.0
    # unsorted input
    assert interval_union_length([(40, 50), (0, 10)]) == 20
