// Generates golden vectors for parity tests (run once; output checked in as
// tests/java_golden.json). Computes, using the JDK only:
//  - HMAC-SHA1/MD5 low-32-bit signed truncations and V3 hash positions
//    (semantics of reference lib/encoding/BloomFilter.java:184-194)
//  - java.util.Random.nextInt streams and Collections.shuffle prefixes
//    (semantics of reference lib/blocking/HammingLSHBlockingGroup.java:43-50)
import javax.crypto.Mac;
import javax.crypto.spec.SecretKeySpec;
import java.math.BigInteger;
import java.nio.charset.StandardCharsets;
import java.util.*;

public class gen_java_golden {
    public static void main(String[] args) throws Exception {
        Mac md5 = Mac.getInstance("HmacMD5");
        md5.init(new SecretKeySpec("ZIKRETQI".getBytes(), "HmacMD5"));
        Mac sha1 = Mac.getInstance("HmacSHA1");
        sha1.init(new SecretKeySpec("ZIKRETQI".getBytes(), "HmacSHA1"));

        String[] grams = {"_a", "ab", "b_", "_j", "jo", "oh", "hn", "n_", "__", "_x", "zz", "q1", "!~", " _", "éa"};
        int[][] nk = {{1024, 10}, {4096, 15}, {4096, 30}, {512, 5}, {1000, 7}};

        StringBuilder sb = new StringBuilder();
        sb.append("{\n  \"v3\": [\n");
        boolean first = true;
        for (String g : grams) {
            byte[] data = g.getBytes(StandardCharsets.UTF_8);
            int s = (new BigInteger(sha1.doFinal(data))).intValue();
            int m = (new BigInteger(md5.doFinal(data))).intValue();
            for (int[] p : nk) {
                int N = p[0], K = p[1];
                int[] hashes = new int[K];
                for (int i = 0; i < K; i++) hashes[i] = Math.abs(((s + (i + 1) * m) % N));
                if (!first) sb.append(",\n");
                first = false;
                sb.append(String.format("    {\"gram\": %s, \"N\": %d, \"K\": %d, \"sha1_int\": %d, \"md5_int\": %d, \"hashes\": %s}",
                        quote(g), N, K, s, m, Arrays.toString(hashes)));
            }
        }
        sb.append("\n  ],\n  \"next_int\": [\n");
        long[] seeds = {42L, 420L, 1L, -7L, 123456789L};
        first = true;
        for (long seed : seeds) {
            Random r = new Random(seed);
            int[] draws = new int[20];
            for (int i = 0; i < 20; i++) draws[i] = r.nextInt(1024);
            if (!first) sb.append(",\n");
            first = false;
            sb.append(String.format("    {\"seed\": %d, \"bound\": 1024, \"draws\": %s}", seed, Arrays.toString(draws)));
            Random r2 = new Random(seed);
            int[] draws2 = new int[20];
            for (int i = 0; i < 20; i++) draws2[i] = r2.nextInt(1000);
            sb.append(",\n");
            sb.append(String.format("    {\"seed\": %d, \"bound\": 1000, \"draws\": %s}", seed, Arrays.toString(draws2)));
        }
        sb.append("\n  ],\n  \"shuffle_prefix\": [\n");
        first = true;
        int[][] shuffleCfg = {{1024, 30}, {4096, 30}, {100, 10}};
        for (long seed : new long[]{420L, 421L, 840L, 12600L}) {
            for (int[] cfg : shuffleCfg) {
                int N = cfg[0], K = cfg[1];
                List<Integer> bits = new ArrayList<>(N);
                for (int i = 0; i < N; i++) bits.add(i, i);
                Collections.shuffle(bits, new Random(seed));
                int[] prefix = new int[K];
                for (int i = 0; i < K; i++) prefix[i] = bits.get(i);
                if (!first) sb.append(",\n");
                first = false;
                sb.append(String.format("    {\"seed\": %d, \"N\": %d, \"K\": %d, \"prefix\": %s}", seed, N, K, Arrays.toString(prefix)));
            }
        }
        sb.append("\n  ]\n}\n");
        System.out.print(sb);
    }

    static String quote(String s) {
        StringBuilder b = new StringBuilder("\"");
        for (char c : s.toCharArray()) {
            if (c == '"' || c == '\\') b.append('\\').append(c);
            else if (c < 0x20 || c > 0x7e) b.append(String.format("\\u%04x", (int) c));
            else b.append(c);
        }
        return b.append('"').toString();
    }
}
