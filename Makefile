# Local dev loop for pypgcdcspark (mirrors the driver's gates).
SF_CORRECTNESS ?= /root/testdata/sf0.01
SF_BENCH ?= /root/testdata/sf0.1
OUT ?= /tmp/graft_verify

.PHONY: compile test verify bench smoke demo livetest all

compile:
	sbt compile

test:
	sbt test

# correctness gate: run all queries, compare against DuckDB
verify:
	sbt "runMain graft.Verify $(SF_CORRECTNESS) $(OUT)"
	python3 scripts/check_oracle.py $(SF_CORRECTNESS) $(OUT)

bench:
	SPARK_GRAFT_SF_DIR=$(SF_BENCH) SPARK_GRAFT_CPUS=32 sbt "runMain graft.Bench"

smoke:
	sbt "runMain graft.Smoke"

# live-Postgres validation: initdb's + runs a scratch PG 15 cluster itself
# (self-cancels where initdb/pg_ctl or the postgres user are absent)
livetest:
	sbt "testOnly graft.sources.LivePgSpec"

demo:
	sbt "runMain graft.CdcDemo /root/testdata/sf0.001 1000"

all: compile test verify bench smoke
