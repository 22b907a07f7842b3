#!/bin/bash
# Regenerate all on-chip training-quality runs sequentially (one chip).
# Each exports inference weights into saved_models/<run>/ for bench.py.
set -x
cd /root/repo
mkdir -p /tmp/regen_logs
python scripts/attention_run.py --steps 6000 \
  > /tmp/regen_logs/attention.log 2>&1
echo "attention_run rc=$?"
python scripts/encoder_run.py --steps 1500 \
  > /tmp/regen_logs/encoder.log 2>&1
echo "encoder_run rc=$?"
python scripts/gan_run.py --gta_run attention_run --steps 3000 \
  > /tmp/regen_logs/gan.log 2>&1
echo "gan_run rc=$?"
python scripts/wavernn_run.py --steps 5000 \
  > /tmp/regen_logs/wavernn.log 2>&1
echo "wavernn_run rc=$?"
python scripts/vits_run.py --steps 3000 \
  > /tmp/regen_logs/vits.log 2>&1
echo "vits_run rc=$?"
python scripts/ppg_run.py --steps 2000 \
  > /tmp/regen_logs/ppg.log 2>&1
echo "ppg_run rc=$?"
ls -la /root/repo/saved_models/*/ 2>&1
