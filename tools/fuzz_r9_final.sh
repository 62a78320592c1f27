#!/bin/bash
set -x
cd /root/repo
python3 tools/fuzz_diff.py /root/testdata/sf0.1 400 90011 --vortex > /tmp/fuzz_r9_d.log 2>&1
echo "batch_d_rc=$?" >> /tmp/fuzz_r9_status2
python3 tools/fuzz_diff.py /root/testdata/sf0.1 400 90012 > /tmp/fuzz_r9_e.log 2>&1
echo "batch_e_rc=$?" >> /tmp/fuzz_r9_status2
python3 tools/fuzz_diff.py /root/testdata/sf0.01 400 90013 --vortex > /tmp/fuzz_r9_f.log 2>&1
echo "batch_f_rc=$?" >> /tmp/fuzz_r9_status2
