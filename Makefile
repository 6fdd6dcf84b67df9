.PHONY: test style bench dryrun

test:
	python -m pytest tests/ -q

style:
	python -m compileall -q kvpress_tpu evaluation tools examples
	python - <<'EOF'
	import ast, pathlib, sys
	bad = []
	for p in pathlib.Path("kvpress_tpu").rglob("*.py"):
	    try:
	        ast.parse(p.read_text())
	    except SyntaxError as e:
	        bad.append(f"{p}: {e}")
	sys.exit(1 if bad else 0)
	EOF

bench:
	python bench.py

dryrun:
	JAX_PLATFORMS= XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -c "import jax; jax.config.update('jax_platforms','cpu'); \
	from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
