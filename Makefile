.PHONY: test style lint bench dryrun serve-bench

test:
	python -m pytest tests/ -q

# Reference parity: `make style` mirrors /root/reference/Makefile's
# flake8+mypy gate with the stdlib AST linter (the image ships no flake8/
# mypy/ruff and installs are not permitted). SPDX headers: non-goal.
style: lint
	python -m compileall -q kvpress_tpu evaluation tools examples

lint:
	python tools/lint.py

bench:
	python bench.py

dryrun:
	python -c "import jax; jax.config.update('jax_platforms','cpu'); \
	from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
