package graft

/** The densest libwebp agreement vector for `Vp8CodecSpec`: 64x48
  * white-noise RGB encoded by libwebp 1.5 at quality 40 (1700 bytes —
  * dense coefficients exercising every token category and both filter
  * strengths), held apart from the spec for readability.
  */
private[graft] object NoiseVector {
  val b64: String =
    "UklGRpwGAABXRUJQVlA4IJAGAABQGACdASpAADAAA4BaJbACdMoSzDUB+FkA" +
    "vwOzt6ANsBzvPoA/w3TEeoB6AHSI/3v/0dQB/7PUA0wVgLmRADOA+sGLPkCO" +
    "BtDd+p1Au+HOx/cvAG+kf5P2AP0Z6o38N+zvmL/Pf75+zPwB/zn/Cf/71WP/" +
    "/7U/179ib9lv/qTzivJXWNRgBdKJUiw4OmkEvmttT1LjX8kt3EtJxInZDAv+" +
    "WzPKBg5lY/YS73dVaXHT6YfJRzThT6aIz3b+o3jfCwouK6APAjetZz4FAAD4" +
    "vRCBhyq3gP7Eim/UfRRmhO1nmPTVL5lp+qh+pzHb5SYJgp6nKmYRAQCLb9eH" +
    "2wEwd8KKD2/pyeXjat6EM0CP2kyOg3gD3Xrug9m2nawF8ib4nM9UqIl9gldv" +
    "Pdw4vM2gUJFOTTSdBOSB9BAA0wHtzEJFUPOrjizm6UWFWfEVVp67UfjG2P3U" +
    "1u6DQcFnCYHA/izW4WSstHU71t3LQnqLCr1lQFqoiVRyg+/4o8Oct8jVnVhU" +
    "s6QGrp8h6Wxjl4ogPb6laGYxY75zZBptBMBJSRV2bhHRnjFPKbyvSZOVY0Y5" +
    "fGOfwX7zh7688KenzMFHFjK6X7L0CCq2+YNv+So0rvFbO58ohwS4Ak7oQDuf" +
    "0ZxotCdyJ1/lcEAzsHcHy82PZ6nUuZ7RWoRHBU/VwLfl+lFgMGICIT9I1Enq" +
    "t3qK36LpY7ql8NLb5YCdsytSbqPt+1O0skB3IyD+coPId3O9hemoQ3BDWW+6" +
    "r0pwOe45Bulm6uhdFhRY0xDZvQNokMWocqBpNUhVgpmt3XkRBKqSCRmj8/6H" +
    "JHZEfhY6bipYNSHAHVTaE6tGvmm8oYMyOyfJhf4438mogDPdEJZpXVoajabA" +
    "FpvdqhAps085H7gZKWWjDOXl14++dvXNQd8faUKpsnxjBGt0h3vnlJ9KAE7H" +
    "YikM36u5XnCNDWk8MqS9+6oC6NrLvmP63gROhlDmCiJQP650NGUbO+wbqFFx" +
    "Qi8sYzWCxaimO7zv+vr5lmm7CRTKYNKQTPQnX7CiyRNsDoYQP8OXFhWgH8pD" +
    "r4ByHne+19yeCib478qL4SxqIL/hCtWZYOI7m30KKX/jRZez55uQblvDkLHe" +
    "oRWIcR+gzzc5fHkZRYIz6vRdr64PT3mdmI8PoRk8HmTNBZHy515L1R5iUgLK" +
    "C8mRyOmejPzAhC2eHMc1RFw7a6bQgwndz39sRPBS2cp+nqprAyzjz5Yp6jwf" +
    "0/y13+oV+fsoFHcXnPS5EpKXmw1i65XSvWVE8g2qmvDJGdudW89K/qF6Zah9" +
    "gAVh0Bc7mjE/uprCzxUVExP38+lB0jiFVAgJXpBajNvB0ZxnazoQRJ/Qw7y0" +
    "irLCADoW5lh8SRBhgpdZkkmdRAbDZx8pMbJlYy10UMLoHDRpchaloBcZ+A+O" +
    "uZ4feEt7Jq6BzJz+3mAM44qcC0+8Gdt5OZHkGCaAEAhE6XtG8i0MqtQ+JjrM" +
    "rApbmm1XV72E0a9V+aACaoUJxvzsKnoNZMMa+DAI/ZB/1qv3kdZEMfE8A9Lm" +
    "EU9Oal+fABoZftOSXyYZJ6kTEqHX21qrDyyPKj6ZkG2uvrsFI5Qma8drSPvp" +
    "AbrjUFrQxgRG65PF4QbERMCArYAdMzFi/0EVmhW1XMgsq2JAshLbgpYdIAju" +
    "FLt//9jHrP4YPhk5KKYvI7hcFUdm3yOb0jdKLgw8KYmn9kOiynrTFj/xGIWc" +
    "Js7hK+jAMeBOFMZ5yQYAZxbRn+npb/5x4qS2Iil9CyzRFxPO7SnDbKGiT1Bk" +
    "614pSWbwF8e//cP/IUKy7KyfFno36YARsCqNx9p5vLFfjNllopxSDlplcp0g" +
    "rFGsquxDRhKd7qh5ywyJy0L9ocYbfAYfPCV8MP0X9htBoLePLkgOGl4U9EDT" +
    "6ctR6XfbpPJVdX4SdFGK5r30SjRE5NJPGZCWcuxeTyZc8zz0w8FgU26rTKW3" +
    "bO5rUMnOaqXgY/8nuUCu4jlTW+9NUJVrDmEuQawRVuaAPOdbKq5sFTA3Gs2B" +
    "+doboWiU6gxp4uxIgUTKUxnvJr4866ccVEpdoBT+KAmv5s+zXwyvy2X22ewA" +
    "wvlqKc00ZD8xxjzfDxv8lVnHft5eNF+Pa/ssa5bSAQNEt7hGK5UWlA5d0mxa" +
    "Hc9Y4Khih5MBaTmetuCxVg6OI9rzeoQjTK67zP1J6eSNoJtqvoEO2EY/4vGD" +
    "ZcKaF8M/w776ppzzNUQ9lTu6CAUVPGLB5heK3yyfxlgJAAA="
}
