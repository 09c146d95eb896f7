.PHONY: test bench flagship ppmi-bench lint report

test:
	python -m pytest tests/ -x -q

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
