"""Shared fixtures: one local SparkSession + synthesized crawl universes."""

from __future__ import annotations

import pytest

from gigaspark.session import get_spark
from gigaspark.synth import SynthParams, gen_all

MICRO = SynthParams(n_hosts=24, pages_lo=3, pages_hi=7, mega_hosts=0,
                    n_seed_hosts=12, n_images=60, out_degree_hi=4)
TINY = SynthParams(n_hosts=120, pages_lo=6, pages_hi=20, mega_hosts=3,
                   mega_share=0.25, n_seed_hosts=40, n_images=200,
                   out_degree_hi=5)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("gigaspark-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def micro_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("micro")
    gen_all(str(d), MICRO)
    return str(d)


@pytest.fixture(scope="session")
def tiny_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny")
    gen_all(str(d), TINY)
    return str(d)


def load_fixtures(spark, fix_dir: str) -> dict:
    names = ["seeds", "link_graph", "robots", "url_filters", "hostmap",
             "page_image", "images", "images_golden"]
    return {n: spark.read.parquet(f"{fix_dir}/{n}.parquet") for n in names}
