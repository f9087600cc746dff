"""Session-factory policy tests (no JVM launched)."""

from tenzir_spark.session import wants_big_heap_tuning


def test_big_heap_tuning_threshold():
    # >=16 GiB heaps opt into 32m G1 regions; everything else stays on
    # JVM defaults (the fragmentation fix targets long token-array sort
    # workloads, not test sessions)
    assert wants_big_heap_tuning("16g")
    assert wants_big_heap_tuning("28G")
    assert wants_big_heap_tuning(" 20g ")
    assert not wants_big_heap_tuning("8g")
    assert not wants_big_heap_tuning("15g")
    assert not wants_big_heap_tuning("512m")
    # m-suffixed forms are the same heap in different units: a 16 GiB
    # heap must get the fragmentation fix regardless of spelling
    assert wants_big_heap_tuning("16384m")
    assert wants_big_heap_tuning("20480M")
    assert not wants_big_heap_tuning("16383m")
    assert not wants_big_heap_tuning("")
    assert not wants_big_heap_tuning("sixteen gigs")
