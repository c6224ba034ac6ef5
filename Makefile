.PHONY: test test-fast bench entry dryrun pallas-check acceptance
pallas-check:
	python -m multimodal_emotion_processing_tpu.bench.pallas_check
test:
	python -m pytest tests/ -q
test-fast:
	python -m pytest tests/ -q -m "not slow"
# real-corpus acceptance flow (docs/REAL_DATA.md "Acceptance"):
#   make acceptance CONFIG=mosei_trans DATA_ROOT=/data/mosei CK=./ck \
#                   PTS="model_1_2.18.pt model_2_2.20.pt ..."
acceptance:
	python -m multimodal_emotion_processing_tpu acceptance $(CONFIG) \
	  --data-root $(DATA_ROOT) --checkpoint-dir $(CK) \
	  $(if $(PTS),--torch-ckpts $(PTS),) -o acceptance.json
bench:
	python bench.py
entry:
	python __graft_entry__.py
dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -c "import jax; jax.config.update('jax_platforms','cpu'); \
	import __graft_entry__ as g; g.dryrun_multichip(8)"
