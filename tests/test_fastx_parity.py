"""FULL-PARITY golden tests: run this engine on the REFERENCE'S OWN test
fixtures with the reference's own flag combinations and assert the exact
outputs its test suite asserts (test/test_sort.py, test_trim.py,
test_split.py). A Filtlong user could switch engines and re-run these
workloads unchanged."""

import numpy as np
import pytest

from filtlong_spark.config import FilterConfig
from filtlong_spark.plans import fastx_pipeline as fp
from filtlong_spark.sources import fastx

REF = "/root/reference/test"


@pytest.fixture(scope="module")
def sort_reads(spark):
    return fastx.read_fastx(spark, f"{REF}/test_sort.fastq").cache()


@pytest.fixture(scope="module")
def sort_fasta(spark):
    return fastx.read_fastx(spark, f"{REF}/test_sort.fasta").cache()


@pytest.fixture(scope="module")
def assembly(spark):
    return fastx.read_fastx(spark, f"{REF}/test_reference.fasta").cache()


@pytest.fixture(scope="module")
def illumina(spark):
    return fastx.read_fastx(spark, [f"{REF}/test_reference_1.fastq.gz",
                                    f"{REF}/test_reference_2.fastq.gz"]).cache()


def kept_names(res):
    return [r["name"] for r in res.kept.collect()]


class TestParser:
    def test_fastq_records(self, spark, sort_reads):
        rows = sort_reads.collect()
        assert [r["name"] for r in rows] == ["test_sort_1", "test_sort_2",
                                             "test_sort_3"]
        assert all(len(r["seq"]) == 5000 and len(r["qual"]) == 5000
                   for r in rows)
        assert all(r["fmt"] == "fastq" for r in rows)

    def test_fasta_and_gzip(self, spark, sort_fasta, illumina):
        assert sort_fasta.count() == 3
        assert illumina.count() > 1000  # two gzipped read files


class TestSortParity:
    """reference test/test_sort.py sweep: Phred ranking (2,3,1) inverts to
    (1,3,2) under either reference type; budget boundaries incl. overshoot."""

    @pytest.mark.parametrize("target,expect_phred,expect_ref", [
        (100_000, ["test_sort_1", "test_sort_2", "test_sort_3"],
                  ["test_sort_1", "test_sort_2", "test_sort_3"]),
        (10_001, ["test_sort_1", "test_sort_2", "test_sort_3"],
                 ["test_sort_1", "test_sort_2", "test_sort_3"]),
        (10_000, ["test_sort_2", "test_sort_3"],
                 ["test_sort_1", "test_sort_3"]),
        (5_001, ["test_sort_2", "test_sort_3"],
                ["test_sort_1", "test_sort_3"]),
        (5_000, ["test_sort_2"], ["test_sort_1"]),
        (1, ["test_sort_2"], ["test_sort_1"]),
    ])
    def test_budget_sweep(self, spark, sort_reads, assembly, target,
                          expect_phred, expect_ref):
        cfg = FilterConfig(target_chars=target)
        assert kept_names(fp.run_filtlong(spark, sort_reads, cfg)) \
            == expect_phred
        assert kept_names(fp.run_filtlong(spark, sort_reads, cfg,
                                          assembly=assembly)) == expect_ref

    def test_read_reference_mode(self, spark, sort_reads, illumina):
        cfg = FilterConfig(target_chars=10_000)
        assert kept_names(fp.run_filtlong(spark, sort_reads, cfg,
                                          ref_reads=illumina)) \
            == ["test_sort_1", "test_sort_3"]

    def test_fasta_input_with_assembly(self, spark, sort_fasta, assembly):
        cfg = FilterConfig(target_chars=10_000)
        res = fp.run_filtlong(spark, sort_fasta, cfg, assembly=assembly)
        assert kept_names(res) == ["test_sort_1", "test_sort_3"]
        # FASTA in -> FASTA out (src/main.cpp:132-134)
        lines = fp.to_fastx_lines(res)
        assert lines[0].startswith(">test_sort_1")

    def test_fasta_without_reference_errors(self, spark, sort_fasta):
        with pytest.raises(ValueError, match="FASTA input not supported"):
            fp.run_filtlong(spark, sort_fasta, FilterConfig(target_chars=1))


class TestTrimParity:
    """reference test/test_trim.py: names, lengths, first/last 8 bases."""

    def test_trim(self, spark, assembly):
        reads = fastx.read_fastx(spark, f"{REF}/test_trim.fastq")
        cfg = FilterConfig(trim=True, mode="refset")
        res = fp.run_filtlong(spark, reads, cfg, assembly=assembly)
        rows = res.kept.collect()
        assert res.total_bases == 4901
        got = [(r["name"], len(r["seq"]), r["seq"][:8], r["seq"][-8:],
                len(r["qual"])) for r in rows]
        assert got == [
            ("test_trim_1", 1300, "GCCCTGGC", "GGGTCCAG", 1300),
            ("test_trim_2_21-701", 681, "GATTTATA", "ATGGCGAC", 681),
            ("test_trim_3_1-970", 970, "CTTGAACA", "TCCTCCAG", 970),
            ("test_trim_4_13-1885", 1873, "CCTTTCTT", "TGATCACC", 1873),
        ]
        assert sum(x[1] for x in got) == 4824


class TestSplitParity:
    """reference test/test_split.py threshold sweep + names."""

    @pytest.mark.parametrize("thr,n_reads,total", [
        (250, 4, 11_600), (201, 4, 11_600), (200, 5, 11_400),
        (175, 5, 11_400), (75, 6, 11_300), (51, 6, 11_300),
        (50, 7, 11_250), (25, 7, 11_250),
    ])
    def test_split_sweep(self, spark, assembly, thr, n_reads, total):
        reads = fastx.read_fastx(spark, f"{REF}/test_split.fastq")
        cfg = FilterConfig(split=thr, mode="refset")
        res = fp.run_filtlong(spark, reads, cfg, assembly=assembly)
        rows = res.kept.collect()
        assert len(rows) == n_reads
        assert sum(len(r["seq"]) for r in rows) == total

    def test_split_names(self, spark, assembly):
        reads = fastx.read_fastx(spark, f"{REF}/test_split.fastq")
        cfg = FilterConfig(split=25, mode="refset")
        res = fp.run_filtlong(spark, reads, cfg, assembly=assembly)
        assert kept_names(res) == [
            "test_split_1", "test_split_2_1-1000", "test_split_2_1051-2900",
            "test_split_3_1-1000", "test_split_3_1101-2900",
            "test_split_4_1-1000", "test_split_4_1201-2900"]

    def test_split_read_reference(self, spark, illumina):
        reads = fastx.read_fastx(spark, f"{REF}/test_split.fastq")
        cfg = FilterConfig(split=25, mode="refset")
        res = fp.run_filtlong(spark, reads, cfg, ref_reads=illumina)
        assert len(kept_names(res)) == 7


class TestErrorParity:
    def test_bad_fastq(self, spark):
        with pytest.raises(Exception, match="incorrect FASTQ format"):
            fastx.read_fastx(spark, f"{REF}/test_bad_fastq.fastq").collect()

    def test_duplicate_names(self, spark, sort_reads):
        dup = sort_reads.union(sort_reads.limit(1))
        with pytest.raises(ValueError, match="duplicate read name"):
            fp.run_filtlong(spark, dup, FilterConfig(target_chars=1))

    def test_trim_without_reference(self, spark, sort_reads):
        # src/arguments.cpp:299-306 / test/test_error_messages.py:134-143
        with pytest.raises(ValueError, match=(
                r"Error: assembly or read reference is required to use "
                r"--trim")):
            fp.run_filtlong(spark, sort_reads, FilterConfig(trim=True))

    def test_split_without_reference(self, spark, sort_reads):
        with pytest.raises(ValueError, match=(
                r"Error: assembly or read reference is required to use "
                r"--split")):
            fp.run_filtlong(spark, sort_reads, FilterConfig(split=250))


class TestDistributedSink:
    def test_write_fastx_matches_driver_formatter(self, spark, assembly,
                                                  tmp_path):
        """Multi-partition distributed write == the driver-side stdout
        formatter byte-for-byte (parts concatenated in filename order),
        incl. children ordered by (file, rec_idx, child_start)."""
        reads = fastx.read_fastx(spark, f"{REF}/test_split.fastq")
        cfg = FilterConfig(split=25, mode="refset")
        res = fp.run_filtlong(spark, reads, cfg, assembly=assembly)
        expected = "".join(fp.to_fastx_lines(res))
        out = str(tmp_path / "fastx_out")
        fp.write_fastx(res, out, n_partitions=4)
        import glob as _glob
        assert len(_glob.glob(out + "/part-*")) >= 1
        assert fp.read_fastx_output(out) == expected

    def test_write_fastx_fasta_format(self, spark, sort_fasta, assembly,
                                      tmp_path):
        cfg = FilterConfig(min_length=1, mode="refset")
        res = fp.run_filtlong(spark, sort_fasta, cfg, assembly=assembly)
        out = str(tmp_path / "fasta_out")
        fp.write_fastx(res, out, n_partitions=3)
        text = fp.read_fastx_output(out)
        assert text == "".join(fp.to_fastx_lines(res))
        assert text.startswith(">")

    def test_sink_plan_single_exchange_and_sort(self, spark, assembly):
        """The sink plan must pay exactly ONE exchange (the range
        partitioning) and ONE sort (within output tasks): consuming the
        globally-ordered `kept` here would bake a second range exchange
        + sort under the repartitionByRange (the round-2 double sort)."""
        reads = fastx.read_fastx(spark, f"{REF}/test_split.fastq")
        cfg = FilterConfig(split=25, mode="refset")
        res = fp.run_filtlong(spark, reads, cfg, assembly=assembly)
        plan = (fp.sink_df(res, n_partitions=4)
                ._jdf.queryExecution().optimizedPlan().toString())
        # the upstream budget window contributes its own exchanges; the
        # SINK itself must add exactly one range repartition and one sort
        # (the old plan had Sort x2: global orderBy + sortWithinPartitions)
        import re
        n_range = plan.count("RepartitionByExpression")
        n_sort = len(re.findall(r"\bSort \[", plan))
        assert n_range == 1, plan
        assert n_sort == 1, plan

    def test_missing_file(self, spark):
        # src/arguments.cpp:310-322 / test/test_error_messages.py:68-88
        with pytest.raises(FileNotFoundError,
                           match=r"Error: cannot find file: BAD_FILENAME"):
            fastx.read_fastx(spark, "BAD_FILENAME")
