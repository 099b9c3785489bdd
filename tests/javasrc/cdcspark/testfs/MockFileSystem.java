package cdcspark.testfs;

import java.net.URI;

import org.apache.hadoop.fs.RawLocalFileSystem;

/**
 * Test-only Hadoop FileSystem: local disk behind a NON-"file" scheme.
 *
 * The one class of bug a purely-local test suite structurally cannot
 * catch is a local-FS assumption — code that looks at the resolved
 * scheme and special-cases "file" (fsutil.publish_text), or that drops
 * to os/glob/pyarrow local paths (versioned.published_row_count).
 * Registering this class as {@code fs.mockfs.impl} makes
 * {@code mockfs:///tmp/...} resolve to an ordinary local directory
 * while every scheme check sees a remote filesystem, so the
 * remote-resolution branches the reference's MinIO staging implies
 * (base_loader.py:107-165) execute end-to-end in CI with no object
 * store.
 *
 * RawLocalFileSystem (not LocalFileSystem) so no .crc side files
 * appear in directory listings the LSM protocol enumerates.
 */
public class MockFileSystem extends RawLocalFileSystem {
    private static final URI NAME = URI.create("mockfs:///");

    @Override
    public URI getUri() {
        return NAME;
    }

    @Override
    public String getScheme() {
        return "mockfs";
    }
}
