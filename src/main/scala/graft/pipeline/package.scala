package graft

/** Pipeline package surface. */
package object pipeline {
  /** Source-compatibility alias: [[graft.drift.CacheScope]] is the
    * canonical definition (the drift pair APIs take one too). */
  type CacheScope = graft.drift.CacheScope
}
