#!/bin/bash
# Stand up the local PostgreSQL 15 cluster the live-PG tests probe for
# (PostgresDialectSpec auto-detects it and cancels cleanly when absent).
# Idempotent: safe to re-run; does nothing if the server already answers.
set -euo pipefail
DIR=/tmp/graft_pg
ARGS=(-h "$DIR" -p 54329 -U postgres)
if psql "${ARGS[@]}" -X -t -A -c "SELECT 1" >/dev/null 2>&1; then
  echo "local PG already running at $DIR:54329"
  exit 0
fi
mkdir -p "$DIR"
chown postgres:postgres "$DIR"
if [ ! -d "$DIR/data" ]; then
  su postgres -s /bin/bash -c "cd /tmp && initdb -D $DIR/data -U postgres -A trust" >/dev/null
fi
su postgres -s /bin/bash -c \
  "cd /tmp && pg_ctl -D $DIR/data -l $DIR/log -o \"-p 54329 -k $DIR -c listen_addresses='localhost'\" start"
psql "${ARGS[@]}" -X -t -A -c "SELECT version()"
