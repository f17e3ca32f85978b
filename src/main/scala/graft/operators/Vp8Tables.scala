package graft.operators

/** The VP8 spec data tables (RFC 6386) carried base64-encoded — the
  * same discipline as the brotli UTF8 context table: large published
  * constants are DATA, not code, and their correctness is proven
  * behaviorally (`Vp8CodecSpec` pins byte-exact agreement with an
  * independent decoder on real-encoder streams, which no wrong table
  * survives).
  *
  *  - `dcQ` / `acQ`: the dc/ac quantizer lookups (§14.1; ac is
  *    little-endian u16 — values reach 284).
  *  - `coefProbs0`: default token probabilities [4][8][3][11] (§13.5).
  *  - `updateProbs`: the probability-update gates [4][8][3][11]
  *    (§13.4).
  *  - `kfBmode`: key-frame 4x4 intra mode probabilities [10][10][9]
  *    (§11.5).
  */
private[graft] object Vp8Tables {

  private def b64(s: String): Array[Byte] =
    java.util.Base64.getDecoder.decode(s)

  val dcQ: Array[Int] = b64(
    "BAUGBwgJCgoLDA0ODxARERITFBQVFRYWFxcYGRkaGxwdHh8gISIjJCUlJico" +
    "KSorLC0uLi8wMTIzNDU2Nzg5Ojs8PT4/QEFCQ0RFRkdISUpLTExNTk9QUVJT" +
    "VFVWV1hZW11fYGJkZWZoamxucHJ0dnp8foCChIaIioyPkZSXmp0=").map(_ & 0xFF)

  val acQ: Array[Int] = {
    val raw = b64(
    "BAAFAAYABwAIAAkACgALAAwADQAOAA8AEAARABIAEwAUABUAFgAXABgAGQAa" +
    "ABsAHAAdAB4AHwAgACEAIgAjACQAJQAmACcAKAApACoAKwAsAC0ALgAvADAA" +
    "MQAyADMANAA1ADYANwA4ADkAOgA8AD4AQABCAEQARgBIAEoATABOAFAAUgBU" +
    "AFYAWABaAFwAXgBgAGIAZABmAGgAagBsAG4AcAByAHQAdwB6AH0AgACDAIYA" +
    "iQCMAI8AkgCVAJgAmwCeAKEApACnAKoArQCxALUAuQC9AMEAxQDJAM0A0QDV" +
    "ANkA3QDhAOUA6gDvAPUA+QD+AAMBCAENARIBFwEcAQ==")
    Array.tabulate(128)(i =>
      (raw(2 * i) & 0xFF) | ((raw(2 * i + 1) & 0xFF) << 8))
  }

  val coefProbs0: Array[Byte] = b64(
    "gICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICA/Yj+/+TbgICAgIC9" +
    "gfL/49X/24CAgGp+4/zW0f//gICAAWL4/+zi//+AgIC1he7+3er/moCAgE6G" +
    "yvfGtP/bgICAAbn5//P/gICAgIC4lvf/7OCAgICAgE1u2P/s5oCAgICAAWX7" +
    "//H/gICAgICqi/H87NH//4CAgCV0xPPk////gICAAcz+//X/gICAgIDPoPr/" +
    "7oCAgICAgGZn5//Tq4CAgICAAZj8//D/gICAgICxh/P/6uGAgICAgFCB0//C" +
    "4ICAgICAAQH/gICAgICAgID2Af+AgICAgICAgP+AgICAgICAgICAxiPt38G7" +
    "oqCRmz6DLcbdrLDcnfzdAUQvktCVp92i/9+AAZXx/93g//+AgIC4jer93tz/" +
    "x4CAgFFjtfKwvvnK//+AAYHo/dbF8sT//4BjedL6ycb/yoCAgBdbo/Kqu/fS" +
    "//+AAcj2/+r/gICAgIBtsvH/5/X//4CAgCyCyf3NwP//gICAAYTv+9vR/6WA" +
    "gIBeiOH72r7//4CAgBZkrvW6of/HgICAAbb5/+jrgICAgIB8j/H/4+qAgICA" +
    "gCNNtfvB0//NgICAAZ33/+zn//+AgIB5jev/4eP//4CAgC1jvPvD2f/ggICA" +
    "AQH7/9X/gICAgIDLAfj//4CAgICAgIkBsf/g/4CAgICA/Qn4+8/Q/8CAgICv" +
    "DeDzwbn5xv//gEkRq92hs+yn/+qAAV/3/dS3//+AgIDvWvT609H//4CAgJtN" +
    "w/i8w///gICAARjv+9rb/82AgIDJM9v/xLqAgICAgEUuvu/J2v/kgICAAb/7" +
    "//+AgICAgIDfpfn/1f+AgICAgI18+P//gICAgICAARD4//+AgICAgIC+JOb/" +
    "7P+AgICAgJUB/4CAgICAgICAAeL/gICAgICAgID3wP+AgICAgICAgPCA/4CA" +
    "gICAgICAAYb8//+AgICAgIDVPvr//4CAgICAgDdd/4CAgICAgICAgICAgICA" +
    "gICAgICAgICAgICAgICAgICAgICAgICAgICAyhjV67q/3KDwr/9+Jrboqbjk" +
    "rv+7gD0uituXsvCq/9iAAXDm+se/95///4CmbeT809f/roCAgCdNouistPWy" +
    "//+AATTc9sbH+dz//4B8Sr/zt8H63f//gBhHgtuaqvO2//+AAbbh+dvw/+CA" +
    "gICVluL82M3/q4CAgBxsqvK3wv7f//+AAVHm/MzL/8CAgIB7ZtH3vMT/6YCA" +
    "gBRfmfOkrf/LgICAAd74/9jVgICAgICor/b8683//4CAgC901//T1P//gICA" +
    "AXns/dTW//+AgICNVNX8ycr/24CAgCpQoPCiuf/NgICAAQH/gICAgICAgID0" +
    "Af+AgICAgICAgO4B/4CAgICAgICA")

  val updateProbs: Array[Byte] = b64(
    "////////////////////////////////////////////sPb////////////f" +
    "8fz///////////n9/f////////////T8///////////q/v7///////////3/" +
    "//////////////b+///////////v/f7///////////7//v////////////j+" +
    "///////////7//7///////////////////////////3+///////////7/v7/" +
    "//////////7//v////////////79//7////////6//7//v////////7/////" +
    "////////////////////////////////////////////////////2f//////" +
    "///////h/PH9///+/////+r68fr9//3+//////7////////////f/v7/////" +
    "/////+79/v7///////////j+///////////5/v//////////////////////" +
    "//////3////////////3/v////////////////////////////3+////////" +
    "///8//////////////////////////////7+///////////9////////////" +
    "//////////////////79///////////6//////////////7/////////////" +
    "////////////////////////////////////////////uvv6///////////q" +
    "+/T+//////////v78/3+//7///////3+///////////s/f7///////////v9" +
    "/f7+//////////7+///////////+/v7///////////////////////////7/" +
    "///////////+/v////////////7////////////////////////////+////" +
    "////////////////////////////////////////////////////////////" +
    "////////////////////////////////////////////////////////////" +
    "////////////////////////////////////+P/////////////6/vz+////" +
    "//////j++f3///////////39///////////2/f3///////////z++/7+////" +
    "//////78///////////4/v3///////////3//v7///////////v+////////" +
    "///1+/7///////////39/v////////////v9///////////8/f7/////////" +
    "///+//////////////z////////////5//7//////////////v//////////" +
    "///9///////////6///////////////////////////////////////////+" +
    "////////////////////////////")

  val kfBmode: Array[Byte] = b64(
    "53gwWXNxeJhwmLNAfqp2LkZfr0WPUFVSSJtnODoKq9q9EQ2YchoRoyzDFQqt" +
    "eRhQwxo+LEBVkEcKJqvVkCIaqi43E4igIc5HPxQIcnLQDAniUSgLYLZUHRAk" +
    "hrdZiWJlaqWUSLtkgp1vIEtQQmanY0o+KOqAKTUJsvGNGghrSisakkmmMRed" +
    "QSZpoDM0H3OAaE8MG9n/VxEHV0RHLHIzD7oXLykObra3FRHCQi0ZZsW9FxIW" +
    "WFiTliouLcTNK2G3dVUmI7M9JzXIVxoVK+irOCIzaHJmHV1NJxxVqzqlWmJA" +
    "IhZ0zhciK6ZJazYgGjMBUSsfRBlqFkCrJOFyIhMVZoS8EEx8PhJOX1U5MjAz" +
    "wWUjn9dvWS5vPJQfrNvkFRJvcHFNVbP/JnhyKCoBxPXRChltWCsdjKbVJSua" +
    "PT8em0MtRAHRZFAIK5oBMxpHjk5OEP+AIsWrKSgFZtO3BAHdMzIRqNHAFxlS" +
    "ih8kqxumJizlQ1c6qVJzGjuzPztatDumXUmaKCgVdI/RIievLw8QtyLfMS23" +
    "LhEhtwZiDyC3OS4WGIABNhElQSBJcxyAF4DNKAMJczPAEgbfVyUJcztNQBUv" +
    "aDcs2gk2NYLiQFpGzSgpFxo5NjlwuAUpJqbVHiIahZh0CiCGJxM13RpyIEn/" +
    "HwlB6gIPAXZJSyAMM8D/oCszWB8jQ2ZVN7pVOBUXbzvNLSXANyZGfElmASJi" +
    "fWIqWGhVda9SX1Q1WYBkcWUtS097LzOAUasBOREFR2Y5NSkxJiENeTlJGgFV" +
    "KQpDik1uWi9ycxUCCmb/phcGZR0QClWAZcQaORIKZmbVIhQrdRQPJKOARAEa" +
    "Zj1HJSI1H/PARTxHJkl3HN4lRC2AIgEvC/WrPhETRpJVNz5GJSslmmSjVaAB" +
    "PwlciBxAIMlVSw8JCUD/uHcQVgYcBUD/GfgBOAgRhIn/N3SAOg8UUoc5Gnko" +
    "pDIfiZqFGSPaM2csg4N7HwaeVihAh5TgLbeAFhoRg/CaDgHRLRAVW0DeBwHF" +
    "OBUnmzyKF2bVUwwNNsD/RC8cVRpVVYCAIJKrEgsHP5CrBAT2IxsKkq6rDBqA" +
    "vlAjY7RQfjYtVX4vV7AzKRQgZUuAi3aSdIBVOCkPsOxVJQk+Rx4Rd3b/ERKK" +
    "ZSY8ijdGKxqOkiQTHqv/YRsUii09PtsBUbxAICkUdZeOFBWjcBMMPcOAMAQY")

  require(dcQ.length == 128 && acQ.length == 128 &&
    coefProbs0.length == 1056 && updateProbs.length == 1056 &&
    kfBmode.length == 900, "vp8 table sizes")
}
