package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.{SnapshotManifestCodec => SM}

/** Snapshot manifest byte-format contract: decode∘encode identity for
  * `.snapshotinfo` (SnapshotDescription) and `data.manifest`
  * (SnapshotDataManifest), unknown-field tolerance, and the directory
  * layout + size-verification of the ship flow (SnapshotShip's
  * end-to-end run is q85's gate; SparkSession-level cases live
  * there).
  */
class SnapshotManifestSpec extends AnyFunSuite {

  private def snap: SM.Snapshot = SM.Snapshot(
    name = "snapA", table = "ns1:orders", creationTime = 1700000000123L,
    version = SM.ManifestVersion,
    families = Seq("d".getBytes(UTF_8), "m".getBytes(UTF_8)),
    regions = Seq(
      SM.RegionManifest(1L, Array.emptyByteArray, "0000005000".getBytes(UTF_8),
        Seq(
          SM.FamilyFiles("d".getBytes(UTF_8),
            Seq(SM.StoreFileRef("sf-00000", 12345L))),
          SM.FamilyFiles("m".getBytes(UTF_8),
            Seq(SM.StoreFileRef("sf-00000", 12345L))))),
      SM.RegionManifest(2L, "0000005000".getBytes(UTF_8), Array.emptyByteArray,
        Seq(
          SM.FamilyFiles("d".getBytes(UTF_8),
            Seq(SM.StoreFileRef("sf-00001", 999L),
              SM.StoreFileRef("sf-00001b", 17L)))))))

  test(".snapshotinfo roundtrip: SnapshotDescription raw proto") {
    val bytes = SM.encodeDescription(snap)
    val (name, table, ct, ver) = SM.decodeDescription(bytes)
    assert(name == "snapA" && table == "ns1:orders")
    assert(ct == 1700000000123L && ver == SM.ManifestVersion)
  }

  test("data.manifest roundtrip: families, regions, store files, sizes") {
    val bytes = SM.encodeDataManifest(snap)
    val (families, regions) = SM.decodeDataManifest(bytes)
    assert(families.map(new String(_, UTF_8)) == Seq("d", "m"))
    assert(regions.size == 2)
    val r0 = regions.head
    assert(r0.regionId == 1L)
    assert(r0.startKey.isEmpty && new String(r0.endKey, UTF_8) == "0000005000")
    assert(r0.families.map(f => new String(f.family, UTF_8)) == Seq("d", "m"))
    assert(r0.families.head.files == Seq(SM.StoreFileRef("sf-00000", 12345L)))
    val r1 = regions(1)
    assert(new String(r1.startKey, UTF_8) == "0000005000" && r1.endKey.isEmpty)
    assert(r1.families.head.files.map(_.name) == Seq("sf-00001", "sf-00001b"))
    assert(r1.families.head.files.map(_.fileSize) == Seq(999L, 17L))
  }

  test("unknown manifest fields are skipped (real clusters add attributes)") {
    // splice extra fields a real manifest carries: StoreFile.reference
    // (field 2, message) and a TableSchema attribute (field 2) — both
    // unknown to graft's model and skipped by wire type
    val base = SM.encodeDataManifest(snap)
    // append a top-level unknown field 9 (varint) — decoders must not
    // choke on fields after the known ones
    val spliced = base ++ Array[Byte]((9 << 3).toByte, 0x2a)
    val (families, regions) = SM.decodeDataManifest(spliced)
    assert(families.size == 2 && regions.size == 2)
  }

  test("Reference half-files roundtrip: proto field, PBUF file form, link names") {
    val half = SM.RefHalf("0000005000".getBytes(UTF_8), top = true)
    // manifest StoreFile.reference field
    val s = snap.copy(regions = Seq(
      SM.RegionManifest(9L, Array.emptyByteArray, Array.emptyByteArray,
        Seq(SM.FamilyFiles("d".getBytes(UTF_8),
          Seq(SM.StoreFileRef("ns1=orders=0000000a-sf-00000", 123L, Some(half))))))))
    val (_, regions) = SM.decodeDataManifest(SM.encodeDataManifest(s))
    val got = regions.head.families.head.files.head
    assert(got.name == "ns1=orders=0000000a-sf-00000")
    assert(got.reference.isDefined)
    assert(new String(got.reference.get.splitRow, UTF_8) == "0000005000")
    assert(got.reference.get.top)
    // standalone .ref file form: PBUF magic + proto; splitkey is the
    // first-on-row cell key (famLen 0, LATEST ts, Type.Maximum)
    val fileBytes = SM.encodeReferenceFile(SM.RefHalf("rowX".getBytes(UTF_8), top = false))
    assert(new String(fileBytes.take(4), UTF_8) == "PBUF")
    val back = SM.decodeReferenceFile(fileBytes)
    assert(new String(back.splitRow, UTF_8) == "rowX" && !back.top)
    val sk = SM.splitKeyBytes("rowX".getBytes(UTF_8))
    assert(sk(2 + 4) == 0 && sk.last == 0xff.toByte)
    // link-name parse (HFileLink.LINK_NAME_PATTERN shapes)
    assert(SM.parseLinkName("ns1=orders=0000000a-sf-00000")
      .contains(("ns1", "orders", "0000000a", "sf-00000")))
    assert(SM.parseLinkName("orders=deadbeef-abc")
      .contains(("default", "orders", "deadbeef", "abc")))
    assert(SM.parseLinkName("plain-store-file").isEmpty)
    assert(SM.parseLinkName("sf-00000").isEmpty)
  }

  test("a default-namespace table encodes as namespace 'default'") {
    val s = snap.copy(table = "orders")
    val (_, table, _, _) = SM.decodeDescription(SM.encodeDescription(s))
    assert(table == "orders")
    // the TableName message inside data.manifest carries ns 'default';
    // decode ignores it but the bytes must contain the literal
    val bytes = SM.encodeDataManifest(s)
    assert(new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
      .contains("default"))
  }
}
