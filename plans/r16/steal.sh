#!/bin/bash
# Sample host steal% over N seconds (default 5): only trust timing runs
# started when this reads low single digits.
N=${1:-5}
read -r _ a b c d e f g h _ < <(grep '^cpu ' /proc/stat)
t0=$((a+b+c+d+e+f+g+h)); s0=$h
sleep "$N"
read -r _ a b c d e f g h _ < <(grep '^cpu ' /proc/stat)
t1=$((a+b+c+d+e+f+g+h)); s1=$h
echo "steal% = $(python3 -c "print(round(100*($s1-$s0)/max(1,$t1-$t0),2))")"
