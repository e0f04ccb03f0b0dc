# Convenience targets (see CLAUDE.md for environment notes)

test:
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/test_mlstm_kernels.py tests/test_pallas_kernels.py \
	  tests/test_model_build.py tests/test_trackers.py tests/test_native.py -q

bench:
	python bench.py

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" \
	  python -c "import jax; jax.config.update('jax_platforms','cpu'); \
	  import __graft_entry__ as g; g.dryrun_multichip(8)"

.PHONY: test test-fast bench dryrun
