.PHONY: test test-fast bench flagship ppmi-bench lint report warmup pipeline adhd-sweep doctor

# environment diagnostics: platform resolution, device attach latency,
# compile-cache health, native data plane, project data layout
doctor:
	python -m multi_modal_normative_modeling_tpu.cli.doctor --root .

# the full train -> test -> analysis chain in ONE process (one device-
# session attach; shared CSV cache / prep memo across stages)
pipeline:
	python -m multi_modal_normative_modeling_tpu.cli.pipeline \
	  -R ADNI -P UCA-gPoE -E 200 -K 10 --fold_parallel

# the reference's commands_list11 ADHD grid as one sweep-engine run
adhd-sweep:
	python scripts/run_adhd_sweep.py

# pre-compile the flagship sweep's training program shapes (persistent cache)
warmup:
	python multimodal_kfold_train_cvae_supervised.py -R ADNI -P UCA-gPoE \
	  -E 200 -K 10 --fold_parallel --warmup_only

test:
	python -m pytest tests/ -x -q

# smoke tier: every unit/parity test, long CLI-integration chains deferred
# (tier membership: tests/conftest.py _SLOW_FILES/_SLOW_TESTS)
test-fast:
	python -m pytest tests/ -x -q -m "not slow"

bench:
	python bench.py

flagship:
	python scripts/run_flagship_experiment.py

ppmi-bench:
	python scripts/bench_ppmi_scale.py

lint:
	python -m compileall -q multi_modal_normative_modeling_tpu bench.py __graft_entry__.py

report:
	python -m multi_modal_normative_modeling_tpu.cli.report
