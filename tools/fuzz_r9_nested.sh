#!/bin/bash
# Round-9 nested/decimal-mode fuzz batches (focused generators, vortex storage mode)
set -x
cd /root/repo
python3 tools/fuzz_diff.py /root/testdata/sf0.001 600 90001 --vortex --nested > /tmp/fuzz_r9_a.log 2>&1
echo "batch_a_rc=$?" >> /tmp/fuzz_r9_status
python3 tools/fuzz_diff.py /root/testdata/sf0.01 500 90002 --vortex --nested > /tmp/fuzz_r9_b.log 2>&1
echo "batch_b_rc=$?" >> /tmp/fuzz_r9_status
python3 tools/fuzz_diff.py /root/testdata/sf0.01 300 90003 --nested > /tmp/fuzz_r9_c.log 2>&1
echo "batch_c_rc=$?" >> /tmp/fuzz_r9_status
