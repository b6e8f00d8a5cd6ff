"""Meta pipeline + stage barrier tests."""

from __future__ import annotations

import os

from tests.conftest import random_genome, revcomp, simulate_reads

from reflexiv_spark.pipelines.meta import meta_assemble
from reflexiv_spark.plans.stages import delete_path, stage, stage_done, write_csv


def test_meta_assembles_genome(spark):
    genome = random_genome(4000, seed=33)
    reads = simulate_reads(genome, read_len=100, coverage=20, seed=34)
    df = spark.createDataFrame([(r,) for r in reads], "seq string")
    contigs = meta_assemble(
        df, klist=(21, 31), min_coverage=2, min_contig=1000
    ).collect()
    assert len(contigs) >= 1
    best = max(contigs, key=lambda r: len(r.seq))
    assert best.seq in genome or revcomp(best.seq) in genome
    assert len(best.seq) >= 0.9 * len(genome)


def test_stage_resume(spark, tmp_path):
    workdir = str(tmp_path / "stages")
    calls = []

    def build():
        calls.append(1)
        return spark.range(10).toDF("x")

    out1 = stage(spark, "s1", workdir, build)
    assert out1.count() == 10
    assert stage_done(spark, f"{workdir}/s1")
    # resume: build NOT called again
    out2 = stage(spark, "s1", workdir, build)
    assert out2.count() == 10
    assert len(calls) == 1
    # resume=False forces rebuild
    stage(spark, "s1", workdir, build, resume=False)
    assert len(calls) == 2
    delete_path(spark, f"{workdir}/s1")
    assert not stage_done(spark, f"{workdir}/s1")


def test_meta_workdir_resume(spark, tmp_path):
    genome = random_genome(1500, seed=35)
    reads = simulate_reads(genome, read_len=100, coverage=15, seed=36)
    df = spark.createDataFrame([(r,) for r in reads], "seq string")
    workdir = str(tmp_path / "meta")
    out1 = {r.seq for r in meta_assemble(
        df, klist=(21, 31), min_contig=500, workdir=workdir
    ).collect()}
    assert stage_done(spark, f"{workdir}/round_k21")
    assert stage_done(spark, f"{workdir}/round_k31")
    # second run resumes from barriers and reproduces the result
    out2 = {r.seq for r in meta_assemble(
        df, klist=(21, 31), min_contig=500, workdir=workdir
    ).collect()}
    assert out1 == out2


def test_write_csv_gzip(spark, tmp_path):
    path = str(tmp_path / "csv_out")
    write_csv(spark.range(5).toDF("x"), path, gzip=True)
    files = os.listdir(path)
    assert any(f.endswith(".csv.gz") for f in files)
    assert "_SUCCESS" in files
