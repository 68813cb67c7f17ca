package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.decode._

/** U1 catalog helper (stubbed query runner, call-count caching contract)
  * and K3 registry checkpoint round-trip. */
class PgCatalogSpec extends AnyFunSuite {

  test("typeName issues format_type once per (oid, typmod) and caches (U1)") {
    var calls = List.empty[String]
    val cat = new PgCatalog(sql => {
      calls ::= sql
      if (sql.contains("format_type(23")) Seq(Seq("integer"))
      else if (sql.contains("format_type(1184")) Seq(Seq("timestamp with time zone"))
      else Seq(Seq("text"))
    })
    assert(cat.typeName(23, -1) === "integer")
    assert(cat.typeName(23, -1) === "integer") // cached
    assert(cat.typeName(1184, -1) === "timestamp with time zone")
    assert(calls.size === 2)
    assert(cat.cachedTypeCount === 2)
    assert(calls.exists(_ === PgCatalog.formatTypeSql(23, -1)))
  }

  test("notNullColumns filters attnotnull=true and caches per table") {
    var calls = 0
    val cat = new PgCatalog(sql => {
      calls += 1
      assert(sql.contains("pg_attribute") && sql.contains("'public'") && sql.contains("'utils'"))
      Seq(Seq("c0", "true"), Seq("c1", "false"), Seq("c2", "true"))
    })
    assert(cat.notNullColumns("public", "utils") === Set("c0", "c2"))
    assert(cat.notNullColumns("public", "utils") === Set("c0", "c2"))
    assert(calls === 1)
  }

  test("registry checkpoint round-trips relations incl. escaped names (K3)") {
    val registry = new SchemaRegistry
    registry.update(Relation(99, "public", "acct", 'd', Vector(
      RelationColumn(partOfKey = true, "id", 20, -1),
      RelationColumn(partOfKey = false, "weird\tname\nhere", 25, -1))))
    registry.update(Relation(100, "s\\x", "t2", 'f', Vector()))
    val text = SchemaRegistryCheckpoint.serialize(registry)
    val back = SchemaRegistryCheckpoint.deserialize(text)
    assert(back.all === registry.all)
    assert(back.getOrThrow(99).columns(1).name === "weird\tname\nhere")
  }

  test("checkpoint save/load through the filesystem") {
    val dir = java.nio.file.Files.createTempDirectory("reg")
    val registry = new SchemaRegistry
    registry.update(Relation(1, "public", "t", 'd',
      Vector(RelationColumn(partOfKey = true, "id", 23, -1))))
    val p = dir.resolve("ckpt/registry.tsv").toString
    SchemaRegistryCheckpoint.save(registry, p)
    assert(SchemaRegistryCheckpoint.load(p).all === registry.all)
  }

  test("deserialize rejects unversioned content") {
    intercept[IllegalArgumentException] {
      SchemaRegistryCheckpoint.deserialize("random junk")
    }
  }
}
