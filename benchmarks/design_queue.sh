#!/bin/bash
# Run the native3 protograph design queue, 2 jobs at a time (2 host cores).
# Order: the 3% operating point first, then the rest of the QBER range.
cd "$(dirname "$0")/.."
Q1=("9 2 32 180 11" "11 2 32 180 11" "13 2 32 160 11" "4 1 32 160 11")
Q2=("7 2 32 180 11" "6 1 32 160 11" "16 2 32 160 11" "5 1 32 160 11")
(
  for j in "${Q1[@]}"; do
    python benchmarks/design_native3.py $j >> /tmp/n3_queue1.log 2>&1
  done
) &
(
  # Wait for any still-running design job on this lane (mb=9 p=1).
  while pgrep -f "design_native3.py 9 1" > /dev/null; do sleep 30; done
  for j in "${Q2[@]}"; do
    python benchmarks/design_native3.py $j >> /tmp/n3_queue2.log 2>&1
  done
) &
wait
echo "design queue done"
