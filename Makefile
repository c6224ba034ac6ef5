.PHONY: test bench entry dryrun pallas-check
pallas-check:
	python -m multimodal_emotion_processing_tpu.bench.pallas_check
test:
	python -m pytest tests/ -q
bench:
	python bench.py
entry:
	python __graft_entry__.py
dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -c "import jax; jax.config.update('jax_platforms','cpu'); \
	import __graft_entry__ as g; g.dryrun_multichip(8)"
